"""Round-5 NEGATIVE: seeding the ring kNN top-k buffer does not pay.

Idea: the round-5 roofline showed the ring kernel extraction-bound
(6.88 emission steps/visited chunk, scan floor 10.7% of runtime), so
pre-fill each query's top-k buffer at j==0 with its k_pad
Morton-rank-window support rows (XLA gather; distances scored in-kernel
with the scan's exact diff^2 arithmetic) and knock those rows out of
every chunk's distance plane via a per-column rank-window test (sorted
rank rides support channel 4, window start rides query channel 3) —
the k-th-best bound starts near-final instead of at inf.

MEASURED (v5e, graded config-6 shape B=16 N=16k k=16 self-kNN, uniform
clouds, bitwise-identical outputs):

    ring unseeded: 70.81 ms   visit_rate 0.5089   steps/visit 6.876
    ring seeded  : 74.63 ms   visit_rate 0.5089   steps/visit 6.727

WHY IT CANNOT WORK (the transferable finding): both governing
quantities are column-REDUCED, not column-wise.  The AABB skip visits a
chunk if ANY of the tile's 512 query columns might improve, and the
emission while-loop runs to the MAX per-column trip count — so
tightening every column's bound leaves the binding column binding.
visit_rate did not move at all; steps/visit moved 2%; the XLA-side seed
gather/layout plus the in-kernel knockout cost +3.8 ms net.  Masked
variant measured worse still (140 vs 91 ms on normal cross-kNN clouds).
The lever that remains is cheaper per-step extraction or lower
column-variance tiling, not better bounds — see probe_r5_knn_ko.py.

The library implementation was removed after the measurement (it was
bitwise-correct, incl. the vq<k_pad masked corner and seed-eviction
soundness — the knockout stays sound after a seed is evicted because
eviction implies k_pad lex-better candidates exist and the buffer max
only decreases).  This probe is self-contained so the negative stays
reproducible: it re-implements the seeded kernel standalone and
cross-checks it bitwise against the library kernel.
"""

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pytorch_points_tpu.core.masking import BIG_COORD
    from pytorch_points_tpu.kernels import nn_sorted, topk_scan
    from pytorch_points_tpu.kernels.dispatch import interpret_mode
    from pytorch_points_tpu.utils.benchmark import measure

    _IDX_RING = topk_scan._IDX_RING
    _INF = jnp.inf
    _round_up = topk_scan._round_up

    def _seed_kernel(qry_ref, sup_ref, seed_ref, out_d_ref, out_i_ref,
                     topd, topi, dcur_ref, thr, *, tm, k_pad):
        j = pl.program_id(2)
        nj = pl.num_programs(2)
        qry = qry_ref[0]
        tq = qry.shape[1]

        @pl.when(j == 0)
        def _():
            seed = seed_ref[0]  # [4*k_pad, tQ], rows c*k_pad+s
            sd = jnp.zeros((k_pad, tq), jnp.float32)
            for c in range(3):
                diff = seed[c * k_pad:(c + 1) * k_pad, :] - qry[c:c + 1, :]
                sd = sd + diff * diff
            topd[:] = sd
            topi[:] = seed[3 * k_pad:4 * k_pad, :].astype(jnp.int32)

        sup = sup_ref[0]
        curmax0 = jnp.max(topd[:], axis=0, keepdims=True)
        lb = jnp.zeros((1, tq), jnp.float32)
        for c in range(3):
            lo = jnp.min(sup[:, c:c + 1])
            hi = jnp.max(sup[:, c:c + 1])
            g = jnp.maximum(jnp.maximum(lo - qry[c:c + 1, :],
                                        qry[c:c + 1, :] - hi), 0.0)
            lb = lb + g * g
        visit = jnp.any(lb <= curmax0)

        @pl.when(visit)
        def _():
            d = jnp.zeros((tm, tq), jnp.float32)
            for c in range(3):
                diff = sup[:, c:c + 1] - qry[c:c + 1, :]
                d = d + diff * diff
            # knock the per-column seed window out of the plane (ranks
            # and window starts are integral f32 < 2^24: compares exact)
            rank = jnp.broadcast_to(sup[:, 4:5], (tm, tq))
            slo = qry[3:4, :]
            member = jnp.logical_and(rank >= slo, rank < slo + float(k_pad))
            d = jnp.where(member, _INF, d)
            dcur_ref[:] = d
            ids = jnp.broadcast_to(sup[:, 3:4], (tm, tq)).astype(jnp.int32)

            thr[0:1] = jnp.full((1, tq), -1.0, jnp.float32)
            thr[1:2] = jnp.full((1, tq), -1.0, jnp.float32)
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tq), 0)
            idf = ids.astype(jnp.float32)

            def step():
                dcur = dcur_ref[:]
                td = thr[0:1]
                ti = thr[1:2]
                gt = jnp.logical_or(
                    dcur > td, jnp.logical_and(dcur == td, idf > ti))
                dm = jnp.where(gt, dcur, _INF)
                m = jnp.min(dm, axis=0, keepdims=True)
                a = jnp.min(
                    jnp.where(dm == m, ids, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True)
                thr[0:1] = m
                thr[1:2] = a.astype(jnp.float32)
                curmax = jnp.max(topd[:], axis=0, keepdims=True)
                widx = jnp.max(
                    jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
                    axis=0, keepdims=True)
                improve = jnp.logical_or(
                    m < curmax,
                    jnp.logical_and(
                        jnp.logical_and(m == curmax, m < _INF), a < widx))
                rsel = jnp.logical_and(topd[:] == curmax, topi[:] == widx)
                wrow = jnp.min(
                    jnp.where(rsel, row_iota, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True)
                hot = jnp.logical_and(row_iota == wrow, improve)
                topd[:] = jnp.where(hot, jnp.broadcast_to(m, topd.shape),
                                    topd[:])
                topi[:] = jnp.where(hot, jnp.broadcast_to(a, topi.shape),
                                    topi[:])
                return jnp.any(improve)

            def cond(state):
                return state[0]

            def body(state):
                _, it = state
                return step(), it + 1

            jax.lax.while_loop(cond, body, (jnp.bool_(True), jnp.int32(0)))

        @pl.when(j == nj - 1)
        def _():
            out_d_ref[0] = topd[:]
            out_i_ref[0] = topi[:]

    @functools.partial(jax.jit, static_argnames=("k", "tq", "tm"))
    def knn_ring_seeded(query, support, k, tq=512, tm=512):
        query = jnp.asarray(query, jnp.float32)
        support = jnp.asarray(support, jnp.float32)
        b, nq, _ = query.shape
        ns = support.shape[1]
        k_pad = _round_up(k, 8)
        assert ns >= k_pad

        ss, perm_s = nn_sorted.sort_by_morton(support)
        qs, perm_q = nn_sorted.sort_by_morton(query)
        q_pad = _round_up(nq, tq)
        m_pad = _round_up(ns, tm)
        padm = m_pad - ns
        sup4 = jnp.concatenate(
            [ss, perm_s[..., None].astype(jnp.float32)], axis=-1)
        if padm:
            offs = -(BIG_COORD * 4.0
                     + 8.0 * jnp.arange(padm, dtype=jnp.float32))
            pad = jnp.zeros((b, padm, 4), jnp.float32)
            pad = pad.at[:, :, 0].set(offs[None, :])
            pad = pad.at[:, :, 3].set(float(_IDX_RING))
            sup4 = jnp.concatenate([sup4, pad], axis=1)

        # seed windows over the sorted clouds; gather and in-kernel
        # knockout share the SAME lo tensor (consistency by construction)
        r = jnp.arange(nq, dtype=jnp.float32)
        lo = jnp.clip(
            jnp.floor(r * (ns / nq)).astype(jnp.int32) - k_pad // 2,
            0, ns - k_pad)
        idx = lo[:, None] + jnp.arange(k_pad, dtype=jnp.int32)[None, :]
        seeds = jnp.take(sup4, idx, axis=1)  # [B, nq, k_pad, 4]
        seeds = jnp.pad(seeds, ((0, 0), (0, q_pad - nq), (0, 0), (0, 0)),
                        mode="edge")
        seeds_t = jnp.transpose(seeds, (0, 3, 2, 1)).reshape(
            b, 4 * k_pad, q_pad)
        qs4 = jnp.concatenate(
            [qs, jnp.broadcast_to(lo.astype(jnp.float32)[None, :, None],
                                  (b, nq, 1))], axis=-1)
        qsp = jnp.pad(qs4, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
        qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 4))),
                              (0, 2, 1))
        ranks = jnp.broadcast_to(
            jnp.arange(m_pad, dtype=jnp.float32)[None, :, None],
            (b, m_pad, 1))
        sup_s = jnp.pad(jnp.concatenate([sup4, ranks], axis=-1),
                        ((0, 0), (0, 0), (0, 3)))

        ni, nj = q_pad // tq, m_pad // tm

        def sup_index(bi, i, j):
            center = ((i * tq + tq // 2) * nj) // q_pad
            off = ((j + 1) // 2) * (2 * (j % 2) - 1)
            return (bi, jax.lax.rem(center + off + nj, nj), 0)

        out_d, out_i = pl.pallas_call(
            functools.partial(_seed_kernel, tm=tm, k_pad=k_pad),
            grid=(b, ni, nj),
            in_specs=[
                pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, 8), sup_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * k_pad, tq),
                             lambda bi, i, j: (bi, 0, i),
                             memory_space=pltpu.VMEM),
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
                pltpu.VMEM((8, tq), jnp.float32),
            ],
            interpret=interpret_mode(),
        )(qry_t, sup_s, seeds_t)

        d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))
        i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
        d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
        inv = jnp.zeros_like(perm_q).at[
            jnp.arange(b)[:, None], perm_q
        ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
        d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
        i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
        return d_out[..., :k], i_out[..., :k]

    B, N, K = 16, 16384, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    f_seed = jax.jit(lambda a: knn_ring_seeded(a, a, K))
    f_ring = jax.jit(lambda a: topk_scan.knn_ring(a, a, K))
    d0, i0 = f_ring(x)
    d1, i1 = f_seed(x)
    ok = bool(jnp.all(i0 == i1)) and bool(jnp.all(d0 == d1))
    print(f"ring (library): {measure(f_ring, x, repeats=3)*1e3:8.2f} ms")
    print(f"ring seeded   : {measure(f_seed, x, repeats=3)*1e3:8.2f} ms  "
          f"bitwise={ok}")


if __name__ == "__main__":
    main()
