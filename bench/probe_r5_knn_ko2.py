"""Round-5 probe #2: cheaper knockout steps for the ring kNN kernel.

The knockout rewrite (probe_r5_knn_ko) left config6 at 58.9 ms,
extraction-bound: ~6.67 steps/visited chunk, each step ~7 logical
[tm, tq] plane passes vs the scan's 3.  The ledger's levers are per-step
cost and column variance; this probe attacks per-step cost twice:

1. UNCONDITIONAL knockout — the library step masks the plane rewrite
   with ``improve`` (a [1, tq] -> [tm, tq] broadcast AND).  That pass is
   removable: per column, ``improve`` is MONOTONE-FALSE over the loop —
   ``m`` (plane min under knockout) is non-decreasing, ``curmax`` is
   non-increasing, and on curmax-ties ``widx`` (max id among tied buffer
   rows) only decreases when an equal-distance lower id inserts — so a
   candidate rejected now is rejected forever, and knocking it out
   unconditionally can never lose a candidate a later step would accept.
   (Exhausted columns knock inf rows to inf: no-op.)

2. FUSED EXTRACT-2 — two extractions per while iteration with the
   intermediate knocked-out plane kept in registers: one scratch write
   per iteration instead of two, and half the loop trips (the while
   cond/carry overhead).  Cost: trips = ceil(max-emissions/2) so up to
   +1 wasted extraction per (column-max) chunk; the second extraction's
   insert recomputes curmax/widx from the updated buffer ([k_pad, tq]
   ops, 32x cheaper than the big planes).  Exit on ``any(improve2)``
   alone is sound by the same monotonicity (improve2 false everywhere
   means every later candidate of every column fails too).

3. The library's existing ``unroll`` knob at 2/4 (round-4's unroll
   negative predates the knockout form) — isolates the pure
   while-iteration overhead share.

Self-contained kernel twins; every variant bitwise-checked against the
library ring kernel at the graded config-6 shape (uniform clouds,
self-kNN), plus a duplicate-point tie cloud.
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

    def _kernel_variant(qry_ref, sup_ref, out_d_ref, out_i_ref,
                        topd, topi, dcur_ref, *, tm, k_pad, form):
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

            def extract(plane):
                """Plane min per column, lowest id on ties."""
                m = jnp.min(plane, axis=0, keepdims=True)
                a = jnp.min(
                    jnp.where(plane == m, ids, jnp.int32(_IDX_RING)),
                    axis=0, keepdims=True,
                )
                return m, a

            def insert(m, a):
                """Insert (m, a) wherever it improves the buffer; returns
                the per-column improve verdict."""
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
                return improve

            if form == "uncond":
                def body(state):
                    _, it = state
                    dcur = dcur_ref[:]
                    m, a = extract(dcur)
                    improve = insert(m, a)
                    # UNCONDITIONAL knockout: no improve broadcast pass
                    dcur_ref[:] = jnp.where(
                        ids == jnp.broadcast_to(a, ids.shape), _INF, dcur)
                    return jnp.any(improve), it + 1
            elif form == "x2":
                def body(state):
                    _, it = state
                    dcur = dcur_ref[:]
                    m1, a1 = extract(dcur)
                    d2 = jnp.where(
                        ids == jnp.broadcast_to(a1, ids.shape), _INF, dcur)
                    m2, a2 = extract(d2)
                    dcur_ref[:] = jnp.where(
                        ids == jnp.broadcast_to(a2, ids.shape), _INF, d2)
                    insert(m1, a1)
                    improve2 = insert(m2, a2)
                    return jnp.any(improve2), it + 1
            elif form == "x3":
                def body(state):
                    _, it = state
                    dcur = dcur_ref[:]
                    m1, a1 = extract(dcur)
                    d2 = jnp.where(
                        ids == jnp.broadcast_to(a1, ids.shape), _INF, dcur)
                    m2, a2 = extract(d2)
                    d3 = jnp.where(
                        ids == jnp.broadcast_to(a2, ids.shape), _INF, d2)
                    m3, a3 = extract(d3)
                    dcur_ref[:] = jnp.where(
                        ids == jnp.broadcast_to(a3, ids.shape), _INF, d3)
                    insert(m1, a1)
                    insert(m2, a2)
                    improve3 = insert(m3, a3)
                    return jnp.any(improve3), it + 1
            else:
                raise ValueError(form)

            def cond(state):
                return state[0]

            enter = jnp.any(jnp.min(d, axis=0) <= curmax0[0])
            jax.lax.while_loop(cond, body, (enter, jnp.int32(0)))

        @pl.when(j == nj - 1)
        def _():
            out_d_ref[0] = topd[:]
            out_i_ref[0] = topi[:]

    @functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "form"))
    def knn_ring_v(query, support, k, tq=512, tm=512, form="uncond"):
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
            functools.partial(_kernel_variant, tm=tm, k_pad=k_pad,
                              form=form),
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
    # tie cloud: every 4th point duplicated (forced equal distances)
    xt = np.asarray(x).copy()
    xt[:, 1::4] = xt[:, ::4]
    xt = jnp.asarray(xt)

    f_lib = jax.jit(lambda a: topk_scan.knn_ring(a, a, K))
    d0, i0 = jax.block_until_ready(f_lib(x))
    dt0, it0 = jax.block_until_ready(f_lib(xt))
    t_lib = measure(f_lib, x, repeats=3)
    print(f"library knockout (cond, unroll=1): {t_lib*1e3:8.2f} ms",
          flush=True)

    for form, tq, tm in (("uncond", 512, 512), ("x2", 512, 512),
                         ("x3", 512, 512), ("x2", 512, 1024),
                         ("x2", 512, 256), ("x2", 1024, 512)):
        f_v = jax.jit(lambda a, form=form, tq=tq, tm=tm: knn_ring_v(
            a, a, K, tq=tq, tm=tm, form=form))
        d1, i1 = f_v(x)
        dt1, it1 = f_v(xt)
        ok = (bool(jnp.all(i0 == i1)) and bool(jnp.all(d0 == d1))
              and bool(jnp.all(it0 == it1)) and bool(jnp.all(dt0 == dt1)))
        t_v = measure(f_v, x, repeats=3)
        print(f"variant {form:8s} tq={tq:4d} tm={tm:4d}: {t_v*1e3:8.2f} ms"
              f"  bitwise={ok}", flush=True)

    for u in (2, 4):
        f_u = jax.jit(lambda a, u=u: topk_scan.knn_ring(a, a, K, unroll=u))
        d1, i1 = f_u(x)
        ok = bool(jnp.all(i0 == i1)) and bool(jnp.all(d0 == d1))
        t_u = measure(f_u, x, repeats=3)
        print(f"library unroll={u}: {t_u*1e3:8.2f} ms  bitwise={ok}",
              flush=True)


if __name__ == "__main__":
    main()
