"""Isolate per-step overhead sources in the resident worklist kernel."""
import functools
import jax, numpy as np, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pytorch_points_tpu.kernels import nn_sorted, distance_tiles as dt
from pytorch_points_tpu.kernels.distance_tiles import _IDX_SENTINEL
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, M = 32, 16384, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)), jnp.float32)
ps, _ = nn_sorted.sort_by_morton(p); qs, _ = nn_sorted.sort_by_morton(q)
pp = dt._pad_points_poison(ps, N); qp = dt._pad_points_poison_neg(qs, M)


def make_variant(body_mode, tn, tm):
    ni, nj = N // tn, M // tm

    def kernel(cnt_ref, pairs_ref, pt3_ref, qs3_ref, out_d1, out_i1,
               accd, acci, d2acc, i2acc):
        bi = pl.program_id(0)
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.zeros_like(acci)
        d2acc[:] = jnp.full_like(d2acc, jnp.inf)
        i2acc[:] = jnp.zeros_like(i2acc)

        def body(k, _):
            v = pairs_ref[bi, k]
            i = v // nj
            j = v - i * nj
            pt = pt3_ref[0, i]
            qt = qs3_ref[0, j]
            d = jnp.zeros((tm, tn), jnp.float32)
            for c in range(3):
                diff = qt[:, c:c+1] - pt[c:c+1, :]
                d = d + diff * diff
            m = jnp.min(d, axis=0, keepdims=True)
            ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            a = jnp.min(jnp.where(d == m, ii, _IDX_SENTINEL), axis=0,
                        keepdims=True) + j * tm
            prev_d = accd[pl.ds(i, 1), :]
            prev_i = acci[pl.ds(i, 1), :]
            better = m < prev_d
            accd[pl.ds(i, 1), :] = jnp.where(better, m, prev_d)
            acci[pl.ds(i, 1), :] = jnp.where(better, a, prev_i)
            if body_mode == "both":
                m2 = jnp.min(d, axis=1, keepdims=True)
                il = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                a2 = jnp.min(jnp.where(d == m2, il, _IDX_SENTINEL), axis=1,
                             keepdims=True) + i * tn
                lane = jax.lax.broadcasted_iota(jnp.int32, d2acc.shape, 1)
                cond = jnp.logical_and(lane == j, m2 < d2acc[:])
                d2acc[:] = jnp.where(cond, jnp.broadcast_to(m2, d2acc.shape), d2acc[:])
                i2acc[:] = jnp.where(cond, jnp.broadcast_to(a2, i2acc.shape), i2acc[:])
            elif body_mode == "both_slice":
                m2 = jnp.min(d, axis=1, keepdims=True)
                il = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                a2 = jnp.min(jnp.where(d == m2, il, _IDX_SENTINEL), axis=1,
                             keepdims=True) + i * tn
                pv = d2acc[:, pl.ds(j, 1)]
                pvi = i2acc[:, pl.ds(j, 1)]
                bet = m2 < pv
                d2acc[:, pl.ds(j, 1)] = jnp.where(bet, m2, pv)
                i2acc[:, pl.ds(j, 1)] = jnp.where(bet, a2, pvi)
            return 0

        jax.lax.fori_loop(0, cnt_ref[bi], body, 0)
        out_d1[0] = accd[:]
        out_i1[0] = acci[:]

    def run(pairs, count):
        pt3 = jnp.transpose(
            jnp.pad(pp, ((0, 0), (0, 0), (0, 5))).reshape(B, ni, tn, 8),
            (0, 1, 3, 2))
        qs3 = jnp.pad(qp, ((0, 0), (0, 0), (0, 5))).reshape(B, nj, tm, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[
                pl.BlockSpec((1, ni, 8, tn), lambda bi, c, pr: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nj, tm, 8), lambda bi, c, pr: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ni, tn), lambda bi, c, pr: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ni, tn), lambda bi, c, pr: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((ni, tn), jnp.float32),
                pltpu.VMEM((ni, tn), jnp.int32),
                pltpu.VMEM((tm, nj), jnp.float32),
                pltpu.VMEM((tm, nj), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, ni, tn), jnp.float32),
                       jax.ShapeDtypeStruct((B, ni, tn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(count, pairs, pt3, qs3)

    return jax.jit(run)


@functools.partial(jax.jit, static_argnames=("tn", "tm", "k_max"))
def prologue(pp, qp, tn, tm, k_max):
    d1 = nn_sorted.band_min(pp, qp); d2 = nn_sorted.band_min(qp, pp)
    c1 = nn_sorted._cand_mask(pp, qp, d1, 64, tn, tm)
    c2 = nn_sorted._cand_mask(qp, pp, d2, 64, tm, tn)
    cand = jnp.logical_or(c1, jnp.transpose(c2, (0, 2, 1)))
    return nn_sorted._compact_pairs(cand, k_max)

for tn, tm in ((256, 256), (512, 256), (256, 512), (512, 512)):
    ni, nj = N // tn, M // tm
    k_max = int(0.62 * ni * nj) + ni
    pairs, count = prologue(pp, qp, tn, tm, k_max)
    cnt = np.asarray(count)
    steps = cnt.sum()
    for mode in ("dir1", "both", "both_slice"):
        try:
            f = make_variant(mode, tn, tm)
            r = f(pairs, count); np.asarray(r[0][0, 0])
            t = measure(f, pairs, count, iters=5)
            print(f"tn={tn} tm={tm} {mode:10s}: {t*1e3:7.2f} ms  "
                  f"({100*cnt.mean()/(ni*nj):4.1f}% cand, {t*1e6/steps:.2f} us/step)")
        except Exception as e:
            print(f"tn={tn} tm={tm} {mode:10s}: FAIL {str(e)[:120]}")
