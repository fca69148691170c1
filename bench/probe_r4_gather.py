"""Round-4: gather kernel reformulation.

probe_r4_reg showed group fwd+bwd = 7.0 ms of the headline, with the
gather (5.3 ms) costing 2.5x its own backward scatter (2.1 ms) on the
SAME rows.  The [C*H, tK] f32 intermediate of _gather_kernel_t eats ~7
VPU plane ops per chunk.  Reformulation: select the h-block by matmul
per channel (gsel = F_c^T[L, H] @ onehotH[H, tK]), then the l-selection
is one elementwise mul + sublane reduce — no [C*H, tK] plane, no fold
matmuls, same MAC count.
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

from pytorch_points_tpu.kernels.dispatch import interpret_mode
from pytorch_points_tpu.kernels.gather import gather_rows_t
from pytorch_points_tpu.utils.benchmark import measure

_L = 128


def _gather_kernel_hsel(idx_ref, f3_ref, out_ref, *, h, c_dim, tk):
    idx = idx_ref[0]  # [1, tK]
    hi = idx // _L
    lo = idx - hi * _L
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, tk), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_L, tk), 0)
    a_t = (hi == iota_h).astype(jnp.bfloat16)  # [H, tK] exact
    bl_t = (lo == iota_l).astype(jnp.float32)  # [L, tK]

    for c in range(c_dim):
        ft = f3_ref[0, c]  # [L, H] f32: ft[l, h] = feat[h*128 + l, c]
        f_hi = ft.astype(jnp.bfloat16)
        r = ft - f_hi.astype(jnp.float32)
        f_mid = r.astype(jnp.bfloat16)
        f_lo = (r - f_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        gsel = (
            jax.lax.dot_general(f_hi, a_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(f_mid, a_t, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(f_lo, a_t, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        )  # [L, tK] f32 — column k = feature rows of block hi_k, exact
        out_ref[0, c] = jnp.sum(gsel * bl_t, axis=0)  # one nonzero per k


@functools.partial(jax.jit, static_argnames=("tk",))
def gather_rows_hsel(features, idx, tk: int = 2048):
    features = jnp.asarray(features, jnp.float32)
    idx = jnp.asarray(idx, jnp.int32)
    b, n, c_dim = features.shape
    k = idx.shape[1]
    n_pad = -(-n // _L) * _L
    h = n_pad // _L
    k_pad = -(-k // tk) * tk
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, k_pad - k)))
    feat = jnp.pad(features, ((0, 0), (0, n_pad - n), (0, 0)))
    # per-channel [L, H] tables: f3[c, l, h] = feat[h*128 + l, c]
    f3 = jnp.transpose(feat.reshape(b, h, _L, c_dim), (0, 3, 2, 1))

    out = pl.pallas_call(
        functools.partial(_gather_kernel_hsel, h=h, c_dim=c_dim, tk=tk),
        grid=(b, k_pad // tk),
        in_specs=[
            pl.BlockSpec((1, 1, tk), lambda bi, kc: (bi, 0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_dim, _L, h), lambda bi, kc: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_dim, tk), lambda bi, kc: (bi, 0, kc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_dim, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * k_pad * _L * c_dim * h,
            bytes_accessed=4 * b * (k_pad * (1 + c_dim) + n_pad * c_dim),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(idx[:, None, :], f3)
    return jnp.transpose(out, (0, 2, 1))[:, :k, :]


def main():
    rng = np.random.default_rng(0)
    B, N = 32, 16384
    K = 2048 * 32  # headline group rows
    for C in (3, 16):
        feat = jnp.asarray(rng.uniform(-1, 1, (B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
        a = gather_rows_t(feat, idx)
        bnew = gather_rows_hsel(feat, idx)
        exact = bool(jnp.all(a == bnew))
        print(f"C={C} bitwise equal: {exact}")
        assert exact
        t_old = measure(lambda f, i: gather_rows_t(f, i), feat, idx) * 1e3
        t_new = measure(lambda f, i: gather_rows_hsel(f, i), feat, idx) * 1e3
        print(f"C={C}: old {t_old:.2f} ms  new {t_new:.2f} ms")


if __name__ == "__main__":
    main()
