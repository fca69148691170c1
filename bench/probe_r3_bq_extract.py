"""Round-3: ball-query variant — replace the ltri cumsum matmul with
iterative first-hit extraction (min-index + clear per local hit)."""
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.kernels.ballquery import (
    _IDX_BIG, _round_up, _pad_points_poison, _finish_bq)
from pytorch_points_tpu.kernels import fps as fpsk
from pytorch_points_tpu.kernels.dispatch import interpret_mode
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, P, NS = 32, 16384, 2048, 32
x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
cen = gather_points(x, fpsk.furthest_point_sample(x, P))


def _bq_extract_kernel(qry_ref, sup_ref, out_idx_ref, out_cnt_ref, cnt_s,
                       idx_s, *, r2, tm, ns, nj):
    cnt_s[:] = jnp.zeros_like(cnt_s)
    idx_s[:] = jnp.full_like(idx_s, _IDX_BIG)
    qry = qry_ref[0]
    tp = qry.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ns, tp), 0).astype(
        jnp.float32)

    def w_cond(st):
        j, done = st
        return jnp.logical_and(j < nj, done == 0)

    def w_body(st):
        j, _ = st
        sup = sup_ref[0, j]
        d2 = jnp.zeros((tm, tp), jnp.float32)
        for c in range(3):
            diff = sup[:, c : c + 1] - qry[c : c + 1, :]
            d2 = d2 + diff * diff
        im = jax.lax.broadcasted_iota(jnp.int32, (tm, tp), 0) + j * tm
        rem0 = jnp.where(d2 < r2, im, _IDX_BIG)  # remaining hits as indices
        tot = jnp.sum((d2 < r2).astype(jnp.float32), axis=0, keepdims=True)
        max_h = jnp.max(tot).astype(jnp.int32)

        def h_body(h, rem):
            cand = jnp.min(rem, axis=0, keepdims=True)  # [1, tp]
            slot = cnt_s[:] + h.astype(jnp.float32)
            rowsel = jnp.logical_and(row_iota == slot, cand[0:1, :] < _IDX_BIG)
            idx_s[:] = jnp.where(rowsel, jnp.minimum(idx_s[:], cand), idx_s[:])
            return jnp.where(rem == cand, _IDX_BIG, rem)

        jax.lax.fori_loop(0, max_h, h_body, rem0)
        cnt_s[:] = cnt_s[:] + tot
        done = (jnp.min(cnt_s[:]) >= ns).astype(jnp.int32)
        return j + 1, done

    jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), jnp.int32(0)))
    out_idx_ref[0] = idx_s[:]
    out_cnt_ref[0] = jnp.minimum(cnt_s[:], float(ns)).astype(jnp.int32)


def ball_query_extract(xyz, centroids, radius, nsample, tm=96):
    b, n, _ = xyz.shape
    p = centroids.shape[1]
    ns_pad = _round_up(nsample, 8)
    p_pad = _round_up(p, 128)
    m_pad = _round_up(n, tm)
    nj = m_pad // tm
    sup = _pad_points_poison(xyz, m_pad)
    qry = jnp.pad(centroids, ((0, 0), (0, p_pad - p), (0, 0)), mode="edge")
    qry_t = jnp.transpose(jnp.pad(qry, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup, ((0, 0), (0, 0), (0, 5))).reshape(b, nj, tm, 8)
    outs = pl.pallas_call(
        functools.partial(_bq_extract_kernel, r2=float(radius) ** 2, tm=tm,
                          ns=ns_pad, nj=nj),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, p_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, tm, 8), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ns_pad, p_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ns_pad, p_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, p_pad), jnp.float32),
            pltpu.VMEM((ns_pad, p_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret_mode(),
    )(qry_t, sup_s)
    return _finish_bq(outs, xyz, centroids, nsample, p, with_coords=False)


f_ref = jax.jit(lambda x, c: bqk.ball_query(x, c, 0.2, NS))
ridx, rcnt = f_ref(x, cen)
print("ref ms:", measure(f_ref, x, cen, iters=8) * 1e3, flush=True)

for tm in (96, 128, 192):
    f = jax.jit(lambda x, c, tm=tm: ball_query_extract(x, c, 0.2, NS, tm=tm))
    idx, cnt = f(x, cen)
    ok = bool(jnp.all(idx == ridx)) and bool(jnp.all(cnt == rcnt))
    t = measure(f, x, cen, iters=8) * 1e3
    print(f"extract tm={tm:4d}: ms={t:.2f} match={ok}", flush=True)
