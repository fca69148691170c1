"""Round-3: manual unroll of the worklist fori_loop.

`fori_loop(..., unroll=U)` needs static bounds, but the accumulator
min-fold is IDEMPOTENT (revisiting a pair can't change min/argmin), so
we instead pad each batch row's worklist to a multiple of U by repeating
entry 0 (a real pair) and run ceil(cnt/U) iterations of a U-entry body —
no per-entry guards.
"""
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pytorch_points_tpu.kernels import nn_sorted
from pytorch_points_tpu.kernels.nn_sorted import _IDX_SENTINEL
from pytorch_points_tpu.kernels.dispatch import interpret_mode
from pytorch_points_tpu.utils.benchmark import measure
from pytorch_points_tpu.kernels.distance_tiles import (
    _pad_points_poison, _pad_points_poison_neg, _round_up)

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
ps, permp = nn_sorted.sort_by_morton(p)
qs, permq = nn_sorted.sort_by_morton(q)
ps4 = jnp.concatenate([ps, permp[..., None].astype(jnp.float32)], -1)
qs4 = jnp.concatenate([qs, permq[..., None].astype(jnp.float32)], -1)
n_pad = _round_up(N, 512)
pp = _pad_points_poison(ps4, n_pad)
qp = _pad_points_poison_neg(qs4, n_pad)
dub1 = nn_sorted.band_min(pp, qp, tb=512, tbq=256, stride=2)


def run_flat_unroll(pairs, count, pp, qp, tn, tm, unroll):
    b, n_pad, _ = pp.shape
    m_pad = qp.shape[1]
    ni, nj = n_pad // tn, m_pad // tm
    # idempotent padding: entries beyond count repeat pairs[:, 0]
    k_max = pairs.shape[1]
    live = jnp.arange(k_max)[None, :] < count[:, None]
    pairs = jnp.where(live, pairs, pairs[:, :1])
    n_iter = (count + unroll - 1) // unroll

    pt3 = jnp.transpose(
        jnp.pad(pp, ((0, 0), (0, 0), (0, 8 - pp.shape[-1])))
        .reshape(b, ni, tn, 8), (0, 1, 3, 2))
    qs3 = jnp.pad(qp, ((0, 0), (0, 0), (0, 8 - qp.shape[-1]))
                  ).reshape(b, nj, tm, 8)

    def kernel(nit_ref, pairs_ref, pt3_ref, qs3_ref, out_d_ref, out_i_ref,
               accd, acci):
        bi = pl.program_id(0)
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.full_like(acci, float(_IDX_SENTINEL))

        def one(k):
            v = pairs_ref[bi, k]
            i = v // nj
            j = v - i * nj
            prev_d = accd[pl.ds(i, 1), :]
            prev_i = acci[pl.ds(i, 1), :]
            pt = pt3_ref[0, i]
            qt = qs3_ref[0, j]
            d = jnp.zeros((tm, tn), jnp.float32)
            for c in range(3):
                diff = qt[:, c:c + 1] - pt[c:c + 1, :]
                d = d + diff * diff
            m = jnp.min(d, axis=0, keepdims=True)
            qid = qt[:, 3:4]
            a = jnp.min(jnp.where(d == m, qid, float(_IDX_SENTINEL)),
                        axis=0, keepdims=True)
            better = jnp.logical_or(
                m < prev_d, jnp.logical_and(m == prev_d, a < prev_i))
            accd[pl.ds(i, 1), :] = jnp.where(better, m, prev_d)
            acci[pl.ds(i, 1), :] = jnp.where(better, a, prev_i)

        def body(t, _):
            base = t * unroll
            for u in range(unroll):
                one(base + u)
            return 0

        jax.lax.fori_loop(0, nit_ref[bi], body, 0)
        out_d_ref[0] = accd[:]
        out_i_ref[0] = acci[:].astype(jnp.int32)

    ix = lambda bi, *pf: (bi, 0, 0, 0)
    ox = lambda bi, *pf: (bi, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(b,),
        in_specs=[pl.BlockSpec((1, ni, 8, tn), ix, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nj, tm, 8), ix, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, ni, tn), ox, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, ni, tn), ox, memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((ni, tn), jnp.float32),
                        pltpu.VMEM((ni, tn), jnp.float32)],
    )
    out_d, out_i = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, ni, tn), jnp.float32),
                   jax.ShapeDtypeStruct((b, ni, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret_mode(),
    )(n_iter.astype(jnp.int32), pairs, pt3, qs3)
    return out_d.reshape(b, n_pad), out_i.reshape(b, n_pad)


ref = None
for tm, unrolls in ((256, (4,)), (128, (4, 8)), (64, (4, 8, 16))):
    cand = nn_sorted._cand_mask(pp, qp, dub1, min(64, tm), 512, tm)
    ni, nj = cand.shape[1], cand.shape[2]
    frac = float(jnp.mean(jnp.sum(cand.reshape(B, -1), 1))) / (ni * nj)
    k_max = int(frac * ni * nj * 1.35) + ni
    pairs, cnt = nn_sorted._compact_pairs(cand, k_max)
    for unroll in unrolls:
        f = jax.jit(functools.partial(run_flat_unroll, tn=512, tm=tm,
                                      unroll=unroll))
        d, i = f(pairs, jnp.minimum(cnt, k_max), pp, qp)
        if ref is None:
            ref = (d[:, :N], i[:, :N])
        ok = bool(jnp.all(d[:, :N] == ref[0])) and bool(
            jnp.all(i[:, :N] == ref[1]))
        t = measure(f, pairs, jnp.minimum(cnt, k_max), pp, qp, iters=8) * 1e3
        print(f"tm={tm:4d} unroll={unroll}: dir1 ms={t:.2f} match={ok}",
              flush=True)
