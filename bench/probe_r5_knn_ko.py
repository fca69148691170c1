"""Round-5 probe: KNOCKOUT extraction under ring order + AABB skip.

The round-4 comparison conflated two axes: the stream kernel =
in-order visiting + knockout extraction (rewrite the distance plane to
remove each extracted candidate); the ring kernel = ring order + AABB
skip + read-only increasing-threshold emission.  Ring order won (70.8 vs
82.8 ms), but knockout-under-ring was never measured.  Per emission step
the threshold form pays a 2-plane lex compare (d, id) + masked min +
arg-where over [tm, tq]; the knockout form pays min + arg-where + a
masked plane WRITE — fewer logical plane passes if Mosaic pipelines the
write.  Extraction is ~85% of the kernel (BASELINE.md round-5 roofline:
6.88 steps/visited chunk, scan floor 10.7%), so a per-step saving is the
one lever the max-over-columns structure leaves open (seeding the buffer
is a measured negative — probe_r5_knn_seed).

Self-contained kernel twin; bitwise-checked against the library ring
kernel at the graded config-6 shape (uniform clouds, self-kNN).
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

    def _ko_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref,
                   topd, topi, dcur_ref, *, tm, k_pad):
        j = pl.program_id(2)
        nj = pl.num_programs(2)

        @pl.when(j == 0)
        def _():
            topd[:] = jnp.full_like(topd, _INF)
            topi[:] = jnp.full_like(topi, jnp.int32(_IDX_RING))

        sup = sup_ref[0]
        qry = qry_ref[0]
        tq = qry.shape[1]
        curmax0 = jnp.max(topd[:], axis=0, keepdims=True)

        lb = jnp.zeros((1, tq), jnp.float32)
        for c in range(3):
            lo = jnp.min(sup[:, c : c + 1])
            hi = jnp.max(sup[:, c : c + 1])
            g = jnp.maximum(jnp.maximum(lo - qry[c : c + 1, :],
                                        qry[c : c + 1, :] - hi), 0.0)
            lb = lb + g * g
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

            def step():
                dcur = dcur_ref[:]
                m = jnp.min(dcur, axis=0, keepdims=True)
                a = jnp.min(
                    jnp.where(dcur == m, ids, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True,
                )
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
                topd[:] = jnp.where(hot, jnp.broadcast_to(m, topd.shape),
                                    topd[:])
                topi[:] = jnp.where(hot, jnp.broadcast_to(a, topi.shape),
                                    topi[:])
                # knock the extracted candidate out of the plane
                dcur_ref[:] = jnp.where(
                    jnp.logical_and(ids == jnp.broadcast_to(a, ids.shape),
                                    jnp.broadcast_to(improve, ids.shape)),
                    _INF, dcur)
                return jnp.any(improve)

            def cond(state):
                return state[0]

            def body(state):
                _, it = state
                more = step()
                return more, it + 1

            jax.lax.while_loop(cond, body, (jnp.bool_(True), jnp.int32(0)))

        @pl.when(j == nj - 1)
        def _():
            out_d_ref[0] = topd[:]
            out_i_ref[0] = topi[:]

    @functools.partial(jax.jit, static_argnames=("k", "tq", "tm"))
    def knn_ring_ko(query, support, k, tq=512, tm=512):
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
        qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))),
                              (0, 2, 1))
        sup_s = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4)))
        ni, nj = q_pad // tq, m_pad // tm

        def sup_index(bi, i, j):
            center = ((i * tq + tq // 2) * nj) // q_pad
            off = ((j + 1) // 2) * (2 * (j % 2) - 1)
            return (bi, jax.lax.rem(center + off + nj, nj), 0)

        out_d, out_i = pl.pallas_call(
            functools.partial(_ko_kernel, tm=tm, k_pad=k_pad),
            grid=(b, ni, nj),
            in_specs=[
                pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, 8), sup_index,
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
            ],
            cost_estimate=pl.CostEstimate(
                flops=30 * b * q_pad * m_pad,
                bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad
                                        + 2 * k_pad * q_pad),
                transcendentals=0,
            ),
            interpret=interpret_mode(),
        )(qry_t, sup_s)

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

    f_thr = jax.jit(lambda a: topk_scan.knn_ring(a, a, K))
    d0, i0 = f_thr(x)
    t_thr = measure(f_thr, x, repeats=3)
    print(f"ring threshold (library, 512x512): {t_thr*1e3:8.2f} ms",
          flush=True)
    import itertools
    for tq, tm in [(512, 512), (512, 256), (512, 1024), (1024, 512),
                   (256, 512)]:
        f_ko = jax.jit(lambda a, tq=tq, tm=tm: knn_ring_ko(a, a, K,
                                                           tq=tq, tm=tm))
        d1, i1 = f_ko(x)
        ok = bool(jnp.all(i0 == i1)) and bool(jnp.all(d0 == d1))
        t_ko = measure(f_ko, x, repeats=3)
        print(f"ring knockout tq={tq:4d} tm={tm:4d}: {t_ko*1e3:8.2f} ms  "
              f"bitwise={ok}", flush=True)


if __name__ == "__main__":
    main()
