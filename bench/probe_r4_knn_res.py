"""Probe: RESIDENT ring kNN — whole Morton-sorted support VMEM-resident,
in-kernel loop over lb-sorted chunks instead of a support grid axis.

Hypothesis (from the round-3 resident ball-query win): the grid form pays
~1 us of grid machinery per support chunk even for AABB-skipped chunks
(16x32x32 = 16384 grid steps at config6), so moving the chunk loop into
the kernel should save ~10 ms.

OUTCOME (2026-08-19, v5e; B=16 N=16k k=16): the resident family LOSES —
  variant A (while_loop, sorted-lower-bound exit: cond compares the next
    chunk's bitcast-int32 bound against the buffer max): 78.5 ms
  variant B (this file: fixed-trip fori_loop, per-chunk AABB gate, no
    scalar exit):        unroll=1: 76.8 ms, unroll=2: 77.1 ms
  grid ring kernel (shipping):                          71.6 ms
All bitwise-identical outputs.  Interpretation: Mosaic pipelines grid
steps (next chunk's DMA + AABB test overlap the current chunk's emission
loop), while the resident loop serializes chunk visits through the
scratch-state dependency — the opposite economics of the ball-query case,
whose per-chunk body had no multi-round data-dependent inner loop to
overlap.  Do not re-try a resident kNN without breaking the inter-chunk
serial dependency.

Over-read safety: the order table is padded with a dedicated all-poison
chunk (appended to the support), whose emissions can never insert.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pytorch_points_tpu.core.masking import BIG_COORD
from pytorch_points_tpu.kernels import nn_sorted, topk_scan
from pytorch_points_tpu.kernels.topk_scan import _IDX_RING, _INF, _round_up
from pytorch_points_tpu.utils.benchmark import measure


def _kernel(ord_ref, qry_ref, sup_ref, aabb_ref, out_d_ref, out_i_ref,
            topd, topi, dcur_ref, thr, *, tm, k_pad, nj_it, unroll):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    topd[:] = jnp.full_like(topd, _INF)
    topi[:] = jnp.full_like(topi, jnp.int32(_IDX_RING))
    qry = qry_ref[0]
    tq = qry.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tq), 0)

    def visit(chunk):
        box = aabb_ref[0, pl.ds(chunk, 1), :]
        curmax0 = jnp.max(topd[:], axis=0, keepdims=True)
        lb = jnp.zeros((1, tq), jnp.float32)
        for c in range(3):
            lo = box[0:1, c : c + 1]
            hi = box[0:1, c + 3 : c + 4]
            g = jnp.maximum(jnp.maximum(lo - qry[c : c + 1, :],
                                        qry[c : c + 1, :] - hi), 0.0)
            lb = lb + g * g
        do = jnp.any(lb <= curmax0)

        @pl.when(do)
        def _():
            sup = sup_ref[0, chunk]
            d = jnp.zeros((tm, tq), jnp.float32)
            for c in range(3):
                diff = sup[:, c : c + 1] - qry[c : c + 1, :]
                d = d + diff * diff
            dcur_ref[:] = d
            ids = jnp.broadcast_to(sup[:, 3:4], (tm, tq)).astype(jnp.int32)
            idf = ids.astype(jnp.float32)
            thr[0:1] = jnp.full((1, tq), -1.0, jnp.float32)
            thr[1:2] = jnp.full((1, tq), -1.0, jnp.float32)

            def step():
                dcur = dcur_ref[:]
                td = thr[0:1]
                ti = thr[1:2]
                gt = jnp.logical_or(
                    dcur > td, jnp.logical_and(dcur == td, idf > ti)
                )
                dm = jnp.where(gt, dcur, _INF)
                m = jnp.min(dm, axis=0, keepdims=True)
                a = jnp.min(
                    jnp.where(dm == m, ids, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True,
                )
                thr[0:1] = m
                thr[1:2] = a.astype(jnp.float32)
                curmax = jnp.max(topd[:], axis=0, keepdims=True)
                widx = jnp.max(
                    jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
                    axis=0, keepdims=True,
                )
                improve = jnp.logical_or(
                    m < curmax,
                    jnp.logical_and(
                        jnp.logical_and(m == curmax, m < _INF), a < widx
                    ),
                )
                rsel = jnp.logical_and(topd[:] == curmax, topi[:] == widx)
                wrow = jnp.min(
                    jnp.where(rsel, row_iota, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True,
                )
                hot = jnp.logical_and(row_iota == wrow, improve)
                topd[:] = jnp.where(
                    hot, jnp.broadcast_to(m, topd.shape), topd[:]
                )
                topi[:] = jnp.where(
                    hot, jnp.broadcast_to(a, topi.shape), topi[:]
                )
                return jnp.any(improve)

            def e_cond(state):
                return state[0]

            def e_body(state):
                _, it = state
                more = step()
                return more, it + 1

            jax.lax.while_loop(e_cond, e_body,
                               (jnp.bool_(True), jnp.int32(0)))

    def body(t, _):
        for u in range(unroll):
            visit(ord_ref[bi, i, t * unroll + u])
        return 0

    jax.lax.fori_loop(0, nj_it, body, 0)
    out_d_ref[0] = topd[:]
    out_i_ref[0] = topi[:]


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "unroll"))
def knn_res2(query, support, k, tq=512, tm=512, unroll=1):
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    k_pad = _round_up(k, 8)

    ss, perm_s = nn_sorted.sort_by_morton(support)
    qs, perm_q = nn_sorted.sort_by_morton(query)

    q_pad = _round_up(nq, tq)
    # +1 dedicated poison chunk for unroll over-read
    m_pad = _round_up(ns, tm) + tm
    qsp = jnp.pad(qs, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    padm = m_pad - ns
    sup4 = jnp.concatenate(
        [ss, perm_s[..., None].astype(jnp.float32)], axis=-1
    )
    offs = -(BIG_COORD * 4.0 + 8.0 * jnp.arange(padm, dtype=jnp.float32))
    pad = jnp.zeros((b, padm, 4), jnp.float32)
    pad = pad.at[:, :, 0].set(offs[None, :])
    pad = pad.at[:, :, 3].set(float(_IDX_RING))
    sup4 = jnp.concatenate([sup4, pad], axis=1)

    ni, nj = q_pad // tq, m_pad // tm
    sup_r = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4))).reshape(b, nj, tm, 8)
    qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))

    sc = sup_r[..., :3]
    slo, shi = jnp.min(sc, axis=2), jnp.max(sc, axis=2)
    aabb = jnp.pad(jnp.concatenate([slo, shi], -1), ((0, 0), (0, 0), (0, 2)))
    qt = qsp.reshape(b, ni, tq, 3)
    qlo, qhi = jnp.min(qt, axis=2), jnp.max(qt, axis=2)
    g = jnp.maximum(
        jnp.maximum(qlo[:, :, None, :] - shi[:, None, :, :],
                    slo[:, None, :, :] - qhi[:, :, None, :]), 0.0,
    )
    lb_tile = jnp.sum(g * g, axis=-1)  # [B, ni, nj]
    order = jnp.argsort(lb_tile, axis=-1).astype(jnp.int32)
    nj_pad = _round_up(nj, unroll)
    if nj_pad != nj:
        # over-read slots visit the dedicated poison chunk (index nj-1 in
        # lb order it sorts last anyway; repeat it explicitly)
        order = jnp.concatenate(
            [order,
             jnp.broadcast_to(order[..., -1:], (b, ni, nj_pad - nj))], -1
        )
    nj_it = nj_pad // unroll

    ix_q = lambda bi, i, od: (bi, 0, i)
    ix_s = lambda bi, i, od: (bi, 0, 0, 0)
    ix_a = lambda bi, i, od: (bi, 0, 0)
    ox = lambda bi, i, od: (bi, 0, i)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ni),
        in_specs=[
            pl.BlockSpec((1, 8, tq), ix_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, tm, 8), ix_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, 8), ix_a, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), ox, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), ox, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),
            pltpu.VMEM((8, tq), jnp.float32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(_kernel, tm=tm, k_pad=k_pad, nj_it=nj_it,
                          unroll=unroll),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * q_pad * m_pad,
            bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad
                                    + 2 * k_pad * q_pad),
            transcendentals=0,
        ),
    )(order, qry_t, sup_r, aabb)

    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    inv = jnp.zeros_like(perm_q).at[
        jnp.arange(b)[:, None], perm_q
    ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
    d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
    i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
    return d_out[..., :k], i_out[..., :k]


def main():
    rng = np.random.default_rng(0)
    B, N, k = 16, 16384, 16
    x = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    x[:, 1000:1128] = x[:, :128]
    xs = jnp.asarray(x)

    f_ring = jax.jit(lambda a: topk_scan.knn_ring(a, a, k))
    d1, i1 = f_ring(xs)
    for u in (1, 2):
        f = jax.jit(lambda a, u=u: knn_res2(a, a, k, unroll=u))
        d2, i2 = f(xs)
        ok = bool(jnp.all(d1 == d2)) and bool(jnp.all(i1 == i2))
        print(f"unroll={u} bitwise:", ok)
        assert ok
        print(f"res2 u{u}:", round(measure(f, xs) * 1e3, 2), "ms")
    print("ring grid:", round(measure(f_ring, xs) * 1e3, 2), "ms")


if __name__ == "__main__":
    main()
