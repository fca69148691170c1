"""Pallas ball-query kernel (SURVEY.md §3.1 N4, BASELINE config 3).

Semantics: for each query center, the indices of the first ``nsample``
support points (in index order) strictly within ``radius``; rows pad by
repeating the first hit; zero-hit rows are all zero — PointNet++ CUDA
behavior, which the reference wraps.

TPU mapping decisions:
  * Same broadcast distance tile as the chamfer kernel (support along
    sublanes, queries along lanes), streamed over support chunks.
  * "Index of the s-th hit" is recovered without any serial scan: an
    inclusive running hit-count C is computed per chunk with an MXU matmul
    against a lower-triangular ones matrix (counts <= tM are exact in f32),
    offset by a per-query carry; the s-th hit is then the min index where
    ``hit & (C == s+1)`` — a pure VPU reduction, min-combined across
    chunks.
  * Early exit: once every query in the tile has nsample hits, remaining
    chunks skip all compute (the scan is index-ordered, so later chunks
    cannot change the result).

The XLA fallback materializes the full [B, P, N] hit matrix (8.6 GB at the
graded config) — this kernel never materializes more than one
[tM, tP] tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.core.masking import BIG_COORD
from pytorch_points_tpu.kernels.dispatch import interpret_mode

_IDX_BIG = 2**30


def _bq_kernel(qry_ref, sup_ref, out_idx_ref, out_cnt_ref, *refs,
               r2, tm, ns, with_coords):
    # pallas passes [outputs..., scratches...]; with_coords appends the
    # three coordinate outputs and their slot-table scratches.
    if with_coords:
        (out_gx_ref, out_gy_ref, out_gz_ref,
         cnt_s, idx_s, gx_s, gy_s, gz_s) = refs
    else:
        cnt_s, idx_s = refs
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        cnt_s[:] = jnp.zeros_like(cnt_s)
        idx_s[:] = jnp.full_like(idx_s, _IDX_BIG)
        if with_coords:
            gx_s[:] = jnp.zeros_like(gx_s)
            gy_s[:] = jnp.zeros_like(gy_s)
            gz_s[:] = jnp.zeros_like(gz_s)

    # Later chunks can't contribute once every query in the tile is full.
    not_done = jnp.min(cnt_s[:]) < ns

    @pl.when(not_done)
    def _():
        sup = sup_ref[0]  # [tM, 8]
        qry = qry_ref[0]  # [8, tP]
        d2 = jnp.zeros((sup.shape[0], qry.shape[1]), jnp.float32)
        for c in range(3):
            diff = sup[:, c : c + 1] - qry[c : c + 1, :]
            d2 = d2 + diff * diff
        hit = d2 < r2

        # Inclusive cumulative hit count along the support axis via MXU:
        # L[a, b] = 1 if a >= b (lower-triangular incl. diagonal).
        # bf16 operands: 0/1 are exact and accumulation is f32, so counts
        # <= tM are exact — and the matmul is one MXU pass instead of the
        # multi-pass f32 decomposition (this matmul dominated the kernel:
        # 16 -> ~5 ms at the graded config).
        ia = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
        ltri = (ia >= ib).astype(jnp.bfloat16)
        cs = jax.lax.dot_general(
            ltri, hit.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tM, tP] f32, counts <= tM: exact
        tp = qry.shape[1]
        im = jax.lax.broadcasted_iota(jnp.int32, (tm, tp), 0) + j * tm
        # chunk-local hit order 1..tM; loop only over the hits this chunk
        # actually produced (typically 1-3), not all ns slots: the h-th
        # local hit of query p lands in global slot cnt_prev[p] + h, which
        # differs per query -> scatter via a one-hot row select over the
        # small [ns, tP] slot table.
        keyed = jnp.where(hit, cs, float(_IDX_BIG))  # [tM, tP]
        max_h = jnp.max(cs[tm - 1 : tm, :]).astype(jnp.int32)  # hits <= this
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (ns, tp), 0
        ).astype(jnp.float32)

        def h_body(h, _):
            hf = h.astype(jnp.float32)
            sel = keyed == hf + 1.0  # [tM, tP] at most one True per column
            cand = jnp.min(
                jnp.where(sel, im, _IDX_BIG), axis=0, keepdims=True
            )  # [1, tP] index of this chunk's (h+1)-th hit per query
            slot = cnt_s[:] + hf  # [1, tP] global slot
            rowsel = jnp.logical_and(
                row_iota == slot, cand[0:1, :] < _IDX_BIG
            )  # [ns, tP]; slots >= ns never match row_iota
            idx_s[:] = jnp.where(
                rowsel, jnp.minimum(idx_s[:], cand), idx_s[:]
            )
            if with_coords:
                # the hit's coords, already centered on its query
                for cth, (gs, qrow) in enumerate(
                    ((gx_s, 0), (gy_s, 1), (gz_s, 2))
                ):
                    g, qr = gs, qrow
                    val = jnp.sum(
                        jnp.where(sel, sup[:, qr : qr + 1], 0.0),
                        axis=0,
                        keepdims=True,
                    ) - qry[qr : qr + 1, :]  # [1, tP]
                    g[:] = jnp.where(
                        rowsel, jnp.broadcast_to(val, g.shape), g[:]
                    )
            return 0

        jax.lax.fori_loop(0, max_h, h_body, 0)
        cnt_s[:] = cnt_s[:] + cs[tm - 1 : tm, :]

    @pl.when(j == nj - 1)
    def _():
        out_idx_ref[0] = idx_s[:]
        out_cnt_ref[0] = jnp.minimum(cnt_s[:], float(ns)).astype(jnp.int32)
        if with_coords:
            out_gx_ref[0] = gx_s[:]
            out_gy_ref[0] = gy_s[:]
            out_gz_ref[0] = gz_s[:]


def _bq_while_kernel(qry_ref, sup_ref, out_idx_ref, out_cnt_ref, *refs,
                     r2, tm, ns, nj, with_coords, unroll=1):
    """Resident while_loop form of _bq_kernel: grid is (B,) with the
    whole support and all slot tables VMEM-resident, and the support
    chunk loop STOPS at the first chunk where every query is full.

    The grid form pays ~1 us of grid machinery per chunk step even for
    the ~80% of chunks its early-exit @pl.when skips (at B=32 N=16k
    that's ~4.5 ms of pure skip overhead); here unvisited chunks cost
    nothing.  Bitwise-identical outputs (same scan order and slot
    arithmetic).

    ``unroll`` processes that many consecutive chunks per while
    iteration (the wrapper pads the support with hit-free poison chunks
    so the over-read tail is a no-op; exit may overshoot by up to
    unroll-1 chunks, which is harmless — extra chunks cannot change a
    full table).  NEGATIVE RESULT: interleaved A/B at B=32 P=2048
    N=16k measures u1=10.5 / u2=11.0 / u4=10.7 ms — the per-chunk cost
    is the serial scalar max_h read feeding the dynamic hit-extraction
    loop, which unrolling does not break; default stays 1.

    NEGATIVE RESULT (round 3, measured): a TWO-PHASE straggler split —
    stop the full-width scan once <= P/4 queries are unfull (chunk ~115
    of 171), finish them on a 4x narrower tile — is exact but gains
    <1 ms net: the narrow phase is chunk-latency-bound, not width-bound
    (full scans: 10.1 ms at tp=2048, 4.7 at 512, 3.8 at 128), and
    repack/merge costs ~1 ms even in row-gather form.  Not worth 3x the
    kernel instances; do not rebuild without new data.
    """
    if with_coords:
        (out_gx_ref, out_gy_ref, out_gz_ref,
         cnt_s, idx_s, gx_s, gy_s, gz_s) = refs
    else:
        cnt_s, idx_s = refs
    cnt_s[:] = jnp.zeros_like(cnt_s)
    idx_s[:] = jnp.full_like(idx_s, _IDX_BIG)
    if with_coords:
        gx_s[:] = jnp.zeros_like(gx_s)
        gy_s[:] = jnp.zeros_like(gy_s)
        gz_s[:] = jnp.zeros_like(gz_s)

    qry = qry_ref[0]  # [8, tP]
    tp = qry.shape[1]
    ia = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
    ltri = (ia >= ib).astype(jnp.bfloat16)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ns, tp), 0).astype(
        jnp.float32
    )

    def w_cond(st):
        j, done = st
        return jnp.logical_and(j < nj, done == 0)

    def chunk_body(j):
        sup = sup_ref[0, j]  # [tM, 8]
        d2 = jnp.zeros((tm, tp), jnp.float32)
        for c in range(3):
            diff = sup[:, c : c + 1] - qry[c : c + 1, :]
            d2 = d2 + diff * diff
        hit = d2 < r2
        cs = jax.lax.dot_general(
            ltri, hit.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tM, tP] inclusive cumulative hit count, exact (<= tM)
        im = jax.lax.broadcasted_iota(jnp.int32, (tm, tp), 0) + j * tm
        keyed = jnp.where(hit, cs, float(_IDX_BIG))
        max_h = jnp.max(cs[tm - 1 : tm, :]).astype(jnp.int32)

        def h_body(h, _):
            hf = h.astype(jnp.float32)
            sel = keyed == hf + 1.0
            cand = jnp.min(
                jnp.where(sel, im, _IDX_BIG), axis=0, keepdims=True
            )
            slot = cnt_s[:] + hf
            rowsel = jnp.logical_and(
                row_iota == slot, cand[0:1, :] < _IDX_BIG
            )
            idx_s[:] = jnp.where(rowsel, jnp.minimum(idx_s[:], cand), idx_s[:])
            if with_coords:
                for gs, qr in ((gx_s, 0), (gy_s, 1), (gz_s, 2)):
                    val = jnp.sum(
                        jnp.where(sel, sup[:, qr : qr + 1], 0.0),
                        axis=0, keepdims=True,
                    ) - qry[qr : qr + 1, :]
                    gs[:] = jnp.where(
                        rowsel, jnp.broadcast_to(val, gs.shape), gs[:]
                    )
            return 0

        jax.lax.fori_loop(0, max_h, h_body, 0)
        cnt_s[:] = cnt_s[:] + cs[tm - 1 : tm, :]

    def w_body(st):
        j, _ = st
        for u in range(unroll):
            chunk_body(j + u)
        done = (jnp.min(cnt_s[:]) >= ns).astype(jnp.int32)
        return j + unroll, done

    jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), jnp.int32(0)))
    out_idx_ref[0] = idx_s[:]
    out_cnt_ref[0] = jnp.minimum(cnt_s[:], float(ns)).astype(jnp.int32)
    if with_coords:
        out_gx_ref[0] = gx_s[:]
        out_gy_ref[0] = gy_s[:]
        out_gz_ref[0] = gz_s[:]


def _round_up(v, m):
    return -(-v // m) * m


def _pad_points_poison(x, target_n):
    b, n, c = x.shape
    if n == target_n:
        return x
    pad = target_n - n
    offs = BIG_COORD * 4.0 + 8.0 * jnp.arange(pad, dtype=x.dtype)
    poison = jnp.zeros((b, pad, c), x.dtype).at[:, :, 0].set(offs[None, :])
    return jnp.concatenate([x, poison], axis=1)


def _ball_query_impl(xyz, centroids, radius, nsample, mask, tp, tm,
                     with_coords):
    from pytorch_points_tpu.core.masking import poison_points

    b, n, _ = xyz.shape
    p = centroids.shape[1]

    if tp is None:
        # Wide query tiles + narrow support chunks measured fastest at the
        # graded config (B=32 P=2048 N=16k r=0.2 ns=32): the kernel is
        # grid-step-overhead bound, and narrow chunks make the per-tile
        # early exit (all queries full) trigger sooner.
        # tp=512/tm=256 -> 15.7 ms; tp=2048/tm=96 -> 9.4 ms.
        tp = min(2048, _round_up(p, 128))
    if tm is None:
        tm = 96 if n >= 2048 else min(256, _round_up(n, 8))
    ns_pad = _round_up(nsample, 8)

    p_pad = _round_up(p, tp)
    m_pad = _round_up(n, tm)
    sup = poison_points(xyz, mask, sign=-1.0)
    sup = _pad_points_poison(sup, m_pad)
    # Pad queries by edge replication: padded queries then fill exactly when
    # the last real query fills, keeping the early-exit condition honest.
    qry = jnp.pad(centroids, ((0, 0), (0, p_pad - p), (0, 0)), mode="edge")

    qry_t = jnp.transpose(jnp.pad(qry, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup, ((0, 0), (0, 0), (0, 5)))

    slot_spec = pl.BlockSpec((1, ns_pad, tp), lambda bi, i, j: (bi, 0, i),
                             memory_space=pltpu.VMEM)
    out_specs = [
        slot_spec,
        pl.BlockSpec((1, 1, tp), lambda bi, i, j: (bi, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, ns_pad, p_pad), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, p_pad), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((1, tp), jnp.float32),
        pltpu.VMEM((ns_pad, tp), jnp.int32),
    ]
    if with_coords:
        out_specs += [slot_spec] * 3
        out_shape += [
            jax.ShapeDtypeStruct((b, ns_pad, p_pad), jnp.float32)
        ] * 3
        scratch += [pltpu.VMEM((ns_pad, tp), jnp.float32)] * 3

    grid = (b, p_pad // tp, m_pad // tm)
    outs = pl.pallas_call(
        functools.partial(
            _bq_kernel, r2=float(radius) ** 2, tm=tm, ns=ns_pad,
            with_coords=with_coords,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tp), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=(9 + 3 * ns_pad) * b * p_pad * m_pad
            + 2 * b * (p_pad // tp) * (m_pad // tm) * tm * tm * tp,
            bytes_accessed=4 * b * (8 * p_pad + 8 * m_pad + ns_pad * p_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(qry_t, sup_s)
    return _finish_bq(outs, xyz, centroids, nsample, p, with_coords)


def _finish_bq(outs, xyz, centroids, nsample, p, with_coords):
    """Shared post-processing: transpose to [B, P, ns], repeat-first-hit
    fill, zero-hit handling (outs as [B, ns_pad, P_pad] planes)."""
    out_idx, out_cnt = outs[0], outs[1]
    idx = jnp.transpose(out_idx[:, :nsample, :p], (0, 2, 1))  # [B, P, ns]
    cnt = jnp.minimum(out_cnt[:, 0, :p], nsample)  # kernel caps at ns_pad
    # Pad-by-first-hit; zero-hit rows all zero.
    first = idx[..., :1]
    first = jnp.where(first == _IDX_BIG, 0, first)
    idx = jnp.where(idx == _IDX_BIG, first, idx)
    if not with_coords:
        return idx, cnt

    g = jnp.stack(
        [jnp.transpose(o[:, :nsample, :p], (0, 2, 1)) for o in outs[2:]],
        axis=-1,
    )  # [B, P, ns, 3] centered on each query; unfilled slots are garbage
    slot_filled = jnp.arange(nsample)[None, None, :] < cnt[..., None]
    # repeat-first-hit fill; zero-hit rows use support[0] - center
    # (idx fill = 0, matching PointNet++ semantics)
    fill0 = xyz[:, :1, :][:, :, None, :] - centroids[:, :, None, :]
    first_g = jnp.where(
        (cnt > 0)[..., None, None], g[:, :, :1, :], fill0
    )
    g = jnp.where(slot_filled[..., None], g, first_g)
    return idx, cnt, g


# Largest query count served by the resident while-loop form (slot
# tables for every query stay VMEM-resident in one tile).
_RESIDENT_MAX_P = 4096


def _ball_query_impl_resident(xyz, centroids, radius, nsample, mask, tm,
                              with_coords, unroll: int = 1):
    from pytorch_points_tpu.core.masking import poison_points

    b, n, _ = xyz.shape
    p = centroids.shape[1]
    if tm is None:
        tm = 96 if n >= 2048 else min(256, _round_up(n, 8))
    ns_pad = _round_up(nsample, 8)
    p_pad = _round_up(p, 128)
    m_pad = _round_up(n, tm)
    nj = m_pad // tm
    sup = poison_points(xyz, mask, sign=-1.0)
    sup = _pad_points_poison(sup, m_pad)
    qry = jnp.pad(centroids, ((0, 0), (0, p_pad - p), (0, 0)), mode="edge")
    qry_t = jnp.transpose(jnp.pad(qry, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup, ((0, 0), (0, 0), (0, 5))).reshape(b, nj, tm, 8)
    if nj % unroll:
        # hit-free poison tail chunks make the unrolled over-read a no-op
        extra = unroll - nj % unroll
        tail = jnp.zeros((b, extra, tm, 8), sup_s.dtype)
        tail = tail.at[..., 0].set(BIG_COORD * 4.0)
        sup_s = jnp.concatenate([sup_s, tail], axis=1)
        nj += extra

    out_specs = [
        pl.BlockSpec((1, ns_pad, p_pad), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p_pad), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, ns_pad, p_pad), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, p_pad), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((1, p_pad), jnp.float32),
        pltpu.VMEM((ns_pad, p_pad), jnp.int32),
    ]
    if with_coords:
        out_specs += [
            pl.BlockSpec((1, ns_pad, p_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3
        out_shape += [
            jax.ShapeDtypeStruct((b, ns_pad, p_pad), jnp.float32)
        ] * 3
        scratch += [pltpu.VMEM((ns_pad, p_pad), jnp.float32)] * 3

    outs = pl.pallas_call(
        functools.partial(
            _bq_while_kernel, r2=float(radius) ** 2, tm=tm, ns=ns_pad,
            nj=nj, with_coords=with_coords, unroll=unroll,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, p_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, tm, 8), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(9 + 3 * ns_pad) * b * p_pad * m_pad // 4
            + 2 * b * nj * tm * tm * p_pad // 4,
            bytes_accessed=4 * b * (8 * p_pad + 8 * m_pad + ns_pad * p_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(qry_t, sup_s)
    return _finish_bq(outs, xyz, centroids, nsample, p, with_coords)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "tp", "tm"))
def ball_query(xyz, centroids, radius: float, nsample: int, mask=None,
               tp: int | None = None, tm: int | None = None):
    """[B,N,3] support, [B,P,3] centers -> (idx [B,P,nsample], cnt [B,P])."""
    # Integer-only outputs: sever the tangent path (no AD rules needed).
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz, jnp.float32))
    centroids = jax.lax.stop_gradient(jnp.asarray(centroids, jnp.float32))
    if tp is None and centroids.shape[1] <= _RESIDENT_MAX_P:
        return _ball_query_impl_resident(xyz, centroids, radius, nsample,
                                         mask, tm, with_coords=False)
    return _ball_query_impl(xyz, centroids, radius, nsample, mask, tp, tm,
                            with_coords=False)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "tp", "tm"))
def ball_query_and_group_coords(xyz, centroids, radius: float, nsample: int,
                                mask=None, tp: int | None = None,
                                tm: int | None = None):
    """Fused SA front half: ball query + CENTERED grouped coordinates.

    Returns (idx [B,P,ns] int32, cnt [B,P] int32,
    grouped_centered [B,P,ns,3] = xyz[idx] - centroids) without a separate
    gather pass — the kernel emits coords while it scans (SURVEY.md §4.3:
    the benchmark path the reference ran as four kernel launches).

    NOTE: output coordinates are non-differentiable (treat like the idx
    output; use group_points on the idx for a differentiable path).
    """
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz, jnp.float32))
    centroids = jax.lax.stop_gradient(jnp.asarray(centroids, jnp.float32))
    if tp is None and centroids.shape[1] <= _RESIDENT_MAX_P:
        return _ball_query_impl_resident(xyz, centroids, radius, nsample,
                                         mask, tm, with_coords=True)
    return _ball_query_impl(xyz, centroids, radius, nsample, mask, tp, tm,
                            with_coords=True)
