"""Round-4 kNN probe v2: ring order + in-kernel AABB chunk skip.

probe_r4_knn.py (v1, ring order alone) was a measured NEGATIVE:
88.7 ms vs 81.4 ms for the unsorted streaming kernel — visiting chunks
near the query tile first tightens the k-th-best bound immediately, but
every far chunk still paid the full [tm, tq] distance compute plus one
extraction-loop entry test, and the lexicographic test ran twice per
loop iteration.

v2 adds the two missing pieces:
 1. AABB chunk skip — before computing distances, reduce the loaded
    chunk to its coordinate AABB (6 tiny reductions) and form a
    per-query lower bound lb = sum_c max(0, lo_c - q, q - hi_c)^2.
    If lb > curmax (the tile's worst current top-k entry) STRICTLY for
    every query, no candidate in the chunk can improve (even on a
    distance tie, d >= lb > curmax), so the whole distance + extraction
    stage is skipped under pl.when.  With Morton-sorted queries AND
    support plus ring-order visits, most chunks skip.
 2. One entry test per iteration — the probe/candidate values are
    stashed in small VMEM scratch by a single `entry_probe()`; the loop
    body consumes the previous probe, inserts + knocks out, then probes
    once for the next iteration (v1 probed twice per body).

Tie-breaks stay exact: lexicographic (d, original-id) with
strict-> skip bound, verified vs the dense lax.top_k oracle incl.
forced duplicate points.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pytorch_points_tpu.core.masking import BIG_COORD
from pytorch_points_tpu.kernels import nn_sorted, topk_scan
from pytorch_points_tpu.kernels.dispatch import interpret_mode
from pytorch_points_tpu.utils.benchmark import measure

_IDF_BIG = float(2**24)  # id sentinel, exact in f32
_INF = jnp.inf


def _knn_ring2_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref,
                      topd, topi, dcur_ref, cand_d, cand_i, *, tm, k_pad):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        topd[:] = jnp.full_like(topd, _INF)
        topi[:] = jnp.full_like(topi, jnp.int32(2**24))

    sup = sup_ref[0]  # [tM, 8]: xyz + orig-id(ch3, f32 exact)
    qry = qry_ref[0]  # [8, tQ]
    tq = qry.shape[1]

    curmax0 = jnp.max(topd[:], axis=0, keepdims=True)  # [1, tQ]

    # --- AABB lower bound for the whole chunk vs each query ---------
    lb = jnp.zeros((1, tq), jnp.float32)
    for c in range(3):
        lo = jnp.min(sup[:, c : c + 1])
        hi = jnp.max(sup[:, c : c + 1])
        g = jnp.maximum(jnp.maximum(lo - qry[c : c + 1, :],
                                    qry[c : c + 1, :] - hi), 0.0)
        lb = lb + g * g
    # strict >: on a tie (d == curmax) a lower id could still enter,
    # but d >= lb > curmax rules that out entirely.
    visit = jnp.any(lb <= curmax0)

    @pl.when(visit)
    def _():
        d = jnp.zeros((tm, tq), jnp.float32)
        for c in range(3):
            diff = sup[:, c : c + 1] - qry[c : c + 1, :]
            d = d + diff * diff
        dcur_ref[:] = d
        ids = jnp.broadcast_to(sup[:, 3:4], (tm, tq)).astype(jnp.int32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tq), 0)

        def entry_probe():
            """One lexicographic (d, id) test; stash candidates in scratch."""
            dcur = dcur_ref[:]
            curmax = jnp.max(topd[:], axis=0, keepdims=True)  # [1, tQ]
            widx = jnp.max(
                jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
                axis=0, keepdims=True,
            )  # worst (max) id among worst-distance rows
            m = jnp.min(dcur, axis=0, keepdims=True)  # [1, tQ]
            a = jnp.min(
                jnp.where(dcur == m, ids, jnp.int32(2**24)),
                axis=0, keepdims=True,
            )
            improve = jnp.logical_or(
                m < curmax,
                jnp.logical_and(
                    jnp.logical_and(m == curmax, m < _INF), a < widx
                ),
            )
            cand_d[0:1] = m
            cand_i[0:1] = a
            cand_i[1:2] = improve.astype(jnp.int32)
            return jnp.any(improve)

        def cond(state):
            return state[0]

        def body(state):
            _, it = state
            m = cand_d[0:1]
            a = cand_i[0:1]
            improve = cand_i[1:2] == 1
            # evict the worst (d, id) buffer row where improving
            curmax = jnp.max(topd[:], axis=0, keepdims=True)
            widx = jnp.max(
                jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
                axis=0, keepdims=True,
            )
            rsel = jnp.logical_and(topd[:] == curmax, topi[:] == widx)
            wrow = jnp.min(
                jnp.where(rsel, row_iota, jnp.int32(2**24)),
                axis=0, keepdims=True,
            )
            hot = jnp.logical_and(row_iota == wrow, improve)
            topd[:] = jnp.where(hot, jnp.broadcast_to(m, topd.shape), topd[:])
            topi[:] = jnp.where(hot, jnp.broadcast_to(a, topi.shape), topi[:])
            # knock the extracted candidate out of the chunk
            dcur = dcur_ref[:]
            sel = jnp.logical_and(
                jnp.logical_and(dcur == m, ids == a), improve
            )
            dcur_ref[:] = jnp.where(sel, _INF, dcur)
            return entry_probe(), it + 1

        jax.lax.while_loop(cond, body, (entry_probe(), jnp.int32(0)))

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[0] = topd[:]
        out_i_ref[0] = topi[:]


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm"))
def knn_ring2(query, support, k: int, tq: int = 512, tm: int = 512):
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    k_pad = _round_up(k, 8)

    ss, perm_s = nn_sorted.sort_by_morton(support)
    qs, perm_q = nn_sorted.sort_by_morton(query)

    q_pad = _round_up(nq, tq)
    m_pad = _round_up(ns, tm)
    qsp = jnp.pad(qs, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    # pad support with far-away poison + big ids (never win, never tie)
    padm = m_pad - ns
    sup4 = jnp.concatenate(
        [ss, perm_s[..., None].astype(jnp.float32)], axis=-1
    )  # [B, Ns, 4]
    if padm:
        offs = -(BIG_COORD * 4.0 + 8.0 * jnp.arange(padm, dtype=jnp.float32))
        pad = jnp.zeros((b, padm, 4), jnp.float32)
        pad = pad.at[:, :, 0].set(offs[None, :])
        pad = pad.at[:, :, 3].set(_IDF_BIG)
        sup4 = jnp.concatenate([sup4, pad], axis=1)

    qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4)))

    ni, nj = q_pad // tq, m_pad // tm

    def sup_index(bi, i, j):
        # query tile i sits at rank fraction (i*tq + tq/2)/q_pad; the
        # matching support chunk is that fraction of nj chunks.
        center = ((i * tq + tq // 2) * nj) // q_pad
        off = ((j + 1) // 2) * (2 * (j % 2) - 1)
        return (bi, jax.lax.rem(center + off + nj, nj), 0)

    grid = (b, ni, nj)
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_ring2_kernel, tm=tm, k_pad=k_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), sup_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),
            pltpu.VMEM((8, tq), jnp.float32),   # probe candidate d
            pltpu.VMEM((8, tq), jnp.int32),     # probe candidate id + improve
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * b * q_pad * m_pad,
            bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad + 2 * k_pad * q_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(qry_t, sup_s)

    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))  # sorted-query order
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    # un-permute query rows back to original order
    inv = jnp.zeros_like(perm_q).at[
        jnp.arange(b)[:, None], perm_q
    ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
    d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
    i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
    return d_out[..., :k], i_out[..., :k]


def main():
    rng = np.random.default_rng(0)
    B, N, K = 16, 16384, 16

    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

    # oracle: XLA top_k on the dense matrix (lowest-index ties)
    def oracle(q, s, k):
        d = jnp.sum((q[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx.astype(jnp.int32)

    # correctness on a small shape first (vs oracle incl. duplicates)
    xs = jnp.asarray(rng.uniform(-1, 1, (4, 1024, 3)), jnp.float32)
    # duplicate a block of points to force distance ties
    xdup = xs.at[:, 512:640].set(xs[:, :128])
    for name, pts in (("random", xs), ("dups", xdup)):
        dr, ir = knn_ring2(pts, pts, K)
        do, io = oracle(pts, pts, K)
        ok_i = bool(jnp.all(ir == io))
        ok_d = bool(jnp.all(dr == do))
        print(f"{name}: idx identical {ok_i}  dist bitwise {ok_d}", flush=True)
        if not ok_i:
            bad = jnp.argwhere(jnp.any(ir != io, -1))[:5]
            for bq in bad:
                bi, qi = int(bq[0]), int(bq[1])
                print("  mismatch b,q", bi, qi)
                print("   ring2", ir[bi, qi], dr[bi, qi])
                print("   orac ", io[bi, qi], do[bi, qi])
        assert ok_i and ok_d

    # config6 shape: current kernel vs ring2 kernel
    d1, i1 = topk_scan.knn(x, x, K)
    d2, i2 = knn_ring2(x, x, K)
    print("config6 idx identical:", bool(jnp.all(i1 == i2)),
          " dist bitwise:", bool(jnp.all(d1 == d2)), flush=True)
    t_old = measure(lambda a: topk_scan.knn(a, a, K), x) * 1e3
    for tm in (512, 256):
        t_new = measure(lambda a: knn_ring2(a, a, K, tm=tm), x) * 1e3
        print(f"B={B} N={N} k={K}: old {t_old:.2f} ms  "
              f"ring2(tm={tm}) {t_new:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
