"""Morton-sorted, chunk-pruned resident ball query (SURVEY.md §3.1 N4,
round-2 verdict item 4 — the Morton-consistent SA pipeline's front half).

Two independent wins over kernels/ballquery.py's grid kernel:

  1. RESIDENT worklist execution: the grid form pays ~1 us of grid-DMA
     overhead per (query-tile, support-chunk) step and its early exit is
     gated by the slowest query in a 2048-wide tile.  Here the grid is
     (B,) — both clouds and all slot tables live in VMEM — and a
     fori_loop visits exactly the candidate pairs (scalar-prefetched),
     zero per-step DMA, like kernels/nn_sorted.py's resident NN kernel.
  2. CHUNK PRUNING: with both clouds Morton-sorted, tiles are spatially
     coherent, so a support chunk whose AABB is farther than ``radius``
     from the query tile's AABB cannot contain a hit and never enters
     the worklist.  Skipped chunks have NO hits, so visiting candidate
     chunks in ascending order reproduces the dense scan's
     first-``nsample``-hits-in-index-order semantics BITWISE (in the
     sorted index space).

Semantics note: this kernel speaks SORTED index space — "first nsample
hits in index order" means Morton-sorted order.  It is the building
block of the order-free SA pipeline (ops/grouping.sample_and_group
``sorted=True``), where the consumer (shared MLP + max-pool) does not
depend on centroid order or within-group hit order; the default public
``ball_query`` keeps the reference's original-index semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.kernels.dispatch import interpret_mode

_IDX_BIG = 2**30

# Worklist budget as a fraction of all (query-tile, support-chunk) pairs;
# overflow falls back to visiting every pair (still exact, just denser).
_BQ_BUDGET_FRAC = 0.75


def _bq_resident_kernel(cnt_ref, pairs_ref, qry_ref, sup_ref,
                        out_idx_ref, out_cnt_ref, *refs,
                        r2, tm, tp, ns, nj, with_coords):
    if with_coords:
        (out_gx_ref, out_gy_ref, out_gz_ref,
         cnt_s, idx_s, gx_s, gy_s, gz_s) = refs
    else:
        cnt_s, idx_s = refs
    bi = pl.program_id(0)
    cnt_s[:] = jnp.zeros_like(cnt_s)
    idx_s[:] = jnp.full_like(idx_s, _IDX_BIG)
    if with_coords:
        gx_s[:] = jnp.zeros_like(gx_s)
        gy_s[:] = jnp.zeros_like(gy_s)
        gz_s[:] = jnp.zeros_like(gz_s)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ns, tp), 0).astype(
        jnp.float32
    )
    ia = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
    ltri = (ia >= ib).astype(jnp.bfloat16)

    def body(k, _):
        v = pairs_ref[bi, k]
        i = v // nj
        j = v - i * nj  # noqa: E741
        ctile = cnt_s[pl.ds(i, 1)][0]  # [1, tP] running counts

        # Candidate chunks for a full tile still arrive after every query
        # filled (the worklist is static); skip their compute like the
        # grid kernel's early exit.
        @pl.when(jnp.min(ctile) < ns)
        def _():
            qry = qry_ref[0, i]  # [8, tP]
            sup = sup_ref[0, j]  # [tM, 8]
            d2 = jnp.zeros((tm, tp), jnp.float32)
            for c in range(3):
                diff = sup[:, c : c + 1] - qry[c : c + 1, :]
                d2 = d2 + diff * diff
            hit = d2 < r2
            # Inclusive cumulative hit count along the support axis (MXU,
            # exact for counts <= tM — see kernels/ballquery.py).
            cs = jax.lax.dot_general(
                ltri, hit.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [tM, tP]
            im = jax.lax.broadcasted_iota(jnp.int32, (tm, tp), 0) + j * tm
            keyed = jnp.where(hit, cs, float(_IDX_BIG))
            max_h = jnp.max(cs[tm - 1 : tm, :]).astype(jnp.int32)

            def h_body(h, _):
                hf = h.astype(jnp.float32)
                sel = keyed == hf + 1.0  # at most one True per column
                cand = jnp.min(
                    jnp.where(sel, im, _IDX_BIG), axis=0, keepdims=True
                )  # [1, tP]
                slot = ctile + hf
                rowsel = jnp.logical_and(
                    row_iota == slot, cand[0:1, :] < _IDX_BIG
                )  # [ns, tP]
                tab = idx_s[pl.ds(i, 1)][0]
                idx_s[pl.ds(i, 1)] = jnp.where(
                    rowsel, jnp.minimum(tab, cand), tab
                )[None]
                if with_coords:
                    for gs, qr in ((gx_s, 0), (gy_s, 1), (gz_s, 2)):
                        val = jnp.sum(
                            jnp.where(sel, sup[:, qr : qr + 1], 0.0),
                            axis=0, keepdims=True,
                        ) - qry[qr : qr + 1, :]
                        gtab = gs[pl.ds(i, 1)][0]
                        gs[pl.ds(i, 1)] = jnp.where(
                            rowsel, jnp.broadcast_to(val, gtab.shape), gtab
                        )[None]
                return 0

            jax.lax.fori_loop(0, max_h, h_body, 0)
            cnt_s[pl.ds(i, 1)] = (ctile + cs[tm - 1 : tm, :])[None]

        return 0

    jax.lax.fori_loop(0, cnt_ref[bi], body, 0)
    out_idx_ref[0] = idx_s[:]
    out_cnt_ref[0] = jnp.minimum(cnt_s[:], float(ns)).astype(jnp.int32)
    if with_coords:
        out_gx_ref[0] = gx_s[:]
        out_gy_ref[0] = gy_s[:]
        out_gz_ref[0] = gz_s[:]


def _round_up(v, m):
    return -(-v // m) * m


def _tile_aabb(x, tile):
    b, n, _ = x.shape
    xr = x.reshape(b, n // tile, tile, 3)
    return jnp.min(xr, axis=2), jnp.max(xr, axis=2)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "tp", "tm", "with_coords")
)
def ball_query_sorted(support, queries, radius: float, nsample: int,
                      tp: int = 512, tm: int = 128,
                      with_coords: bool = False):
    """Ball query on MORTON-SORTED clouds with chunk pruning.

    Args:
      support: [B, N, 3] support cloud, Morton-sorted (N % tm == 0 after
        internal padding; padded points are poisoned far away).
      queries: [B, P, 3] query centers, Morton-sorted for pruning to bite
        (correct for any order).
      with_coords: also emit centered grouped coordinates (fused group).

    Returns:
      (idx [B, P, nsample] int32 into the SORTED support, cnt [B, P]) and,
      with_coords, grouped_centered [B, P, nsample, 3].  Identical to
      kernels/ballquery.ball_query run on the same sorted inputs.
    """
    from pytorch_points_tpu.kernels.ballquery import _pad_points_poison

    support = jax.lax.stop_gradient(jnp.asarray(support, jnp.float32))
    queries = jax.lax.stop_gradient(jnp.asarray(queries, jnp.float32))
    b, n, _ = support.shape
    p = queries.shape[1]
    ns_pad = _round_up(nsample, 8)
    p_pad = _round_up(p, tp)
    m_pad = _round_up(n, tm)
    sup = _pad_points_poison(support, m_pad)
    qry = jnp.pad(queries, ((0, 0), (0, p_pad - p), (0, 0)), mode="edge")

    # Chunk pruning: support chunk j can hit query tile i only if the
    # AABB-to-AABB squared gap is under r^2 (1e-5 guard absorbs f32
    # rounding, keeping the bound sound for strict d2 < r2 hits).
    qlo, qhi = _tile_aabb(qry, tp)  # [B, nPt, 3]
    slo, shi = _tile_aabb(sup, tm)  # [B, nj, 3]
    gap = jnp.maximum(
        jnp.maximum(slo[:, None] - qhi[:, :, None], qlo[:, :, None] - shi[:, None]),
        0.0,
    )
    lb = jnp.sum(gap * gap, axis=-1)  # [B, nPt, nj]
    cand = lb * (1.0 - 1e-5) < float(radius) ** 2

    npt, nj = cand.shape[1], cand.shape[2]
    k_max = max(npt, min(npt * nj, int(_BQ_BUDGET_FRAC * npt * nj) + npt))
    from pytorch_points_tpu.kernels.nn_sorted import _compact_pairs

    pairs, count = _compact_pairs(cand, k_max)
    overflow = jnp.any(count > k_max)
    count = jnp.minimum(count, k_max)
    # Budget overflow (pathological geometry) falls back to the dense
    # grid kernel via the lax.cond below — always exact, just slower.

    qry_t = jnp.transpose(jnp.pad(qry, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    qry_t = qry_t.reshape(b, 8, npt, tp).transpose(0, 2, 1, 3)  # [B,nPt,8,tP]
    sup_s = jnp.pad(sup, ((0, 0), (0, 0), (0, 5))).reshape(b, nj, tm, 8)

    out_shape = [
        jax.ShapeDtypeStruct((b, npt, ns_pad, tp), jnp.int32),
        jax.ShapeDtypeStruct((b, npt, 1, tp), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((npt, 1, tp), jnp.float32),
        pltpu.VMEM((npt, ns_pad, tp), jnp.int32),
    ]
    if with_coords:
        out_shape += [
            jax.ShapeDtypeStruct((b, npt, ns_pad, tp), jnp.float32)
        ] * 3
        scratch += [pltpu.VMEM((npt, ns_pad, tp), jnp.float32)] * 3

    ix4 = lambda bi, *pf: (bi, 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npt, 8, tp), ix4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, tm, 8), ix4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, npt, ns_pad, tp), ix4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npt, 1, tp), ix4, memory_space=pltpu.VMEM),
        ]
        + (
            [pl.BlockSpec((1, npt, ns_pad, tp), ix4,
                          memory_space=pltpu.VMEM)] * 3
            if with_coords else []
        ),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(
            _bq_resident_kernel, r2=float(radius) ** 2, tm=tm, tp=tp,
            ns=ns_pad, nj=nj, with_coords=with_coords,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(9 + 3 * ns_pad) * b * pairs.shape[1] * tm * tp // 2,
            bytes_accessed=4 * b * (8 * p_pad + 8 * m_pad
                                    + 2 * ns_pad * p_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(count, pairs, qry_t, sup_s)

    def finish(outs):
        out_idx = outs[0].transpose(0, 2, 1, 3).reshape(b, ns_pad, p_pad)
        out_cnt = outs[1].transpose(0, 2, 1, 3).reshape(b, 1, p_pad)
        idx = jnp.transpose(out_idx[:, :nsample, :p], (0, 2, 1))
        cnt = jnp.minimum(out_cnt[:, 0, :p], nsample)
        first = idx[..., :1]
        first = jnp.where(first == _IDX_BIG, 0, first)
        idx = jnp.where(idx == _IDX_BIG, first, idx)
        if not with_coords:
            return idx, cnt
        g = jnp.stack(
            [
                jnp.transpose(
                    o.transpose(0, 2, 1, 3).reshape(b, ns_pad, p_pad)
                    [:, :nsample, :p],
                    (0, 2, 1),
                )
                for o in outs[2:]
            ],
            axis=-1,
        )
        slot_filled = jnp.arange(nsample)[None, None, :] < cnt[..., None]
        fill0 = support[:, :1, :][:, :, None, :] - queries[:, :, None, :]
        first_g = jnp.where((cnt > 0)[..., None, None], g[:, :, :1, :], fill0)
        g = jnp.where(slot_filled[..., None], g, first_g)
        return idx, cnt, g

    pruned = finish(outs)

    def dense_fallback(_):
        from pytorch_points_tpu.kernels import ballquery

        return ballquery._ball_query_impl(
            support, queries, radius, nsample, None, None, None,
            with_coords=with_coords,
        )

    return jax.lax.cond(overflow, dense_fallback, lambda _: pruned, None)
