"""Pallas MXU gather (forward of gather_points/group_points at scale).

XLA's row gather on TPU runs at ~7.5 ns/row (latency-bound scalar loads);
at training scale (2M gathered rows) that's ~15 ms.  This kernel turns the
gather into the same bilinear one-hot contraction as kernels/scatter.py,
run in reverse:

    out[k, c] = sum_{h,l} onehotH[k, h] * onehotL[k, l] * feat[h*128+l, c]
              = sum_h onehotH[k, h] * (onehotL @ feat_rearranged)[k, c*H+h]

i.e. one [tK, 128] x [128, C*H] MXU matmul per chunk followed by a cheap
per-channel lane reduction.  Exactness: the one-hot factor is exact in
bf16 and the feature table is split into three bf16 planes (8+8+8 mantissa
bits cover f32's 24), so each gathered value is reconstructed to <=1 ulp
— deterministic, no atomics, no scalar loads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.kernels.dispatch import interpret_mode

_L = 128


def _gather_kernel(idx_ref, f2_ref, out_ref, *, h, c_dim, tk):
    idx = idx_ref[0]  # [tK, 1]
    hi = idx // _L
    lo = idx - hi * _L
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tk, _L), 1)
    bl = (lo == iota_l).astype(jnp.bfloat16)  # [tK, L] exact

    # f2 is c-major: f2[l, c*H + h] = feat[h*128 + l, c]
    f2 = f2_ref[0]  # [L, H*C] f32
    f_hi = f2.astype(jnp.bfloat16)
    r1 = f2 - f_hi.astype(jnp.float32)
    f_mid = r1.astype(jnp.bfloat16)
    f_lo = (r1 - f_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    p = (
        jax.lax.dot_general(bl, f_hi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(bl, f_mid, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(bl, f_lo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )  # [tK, C*H]: row lo_k of the table, all (c, h) pairs

    # zero out every h except hi_k (pltpu.repeat TILES, i.e. produces
    # [sel sel ...] matching the c-major layout), then fold the per-channel
    # sum over h with one fixed one-hot matmul: T[c*H + h, c'] = [c == c']
    # — no per-channel unroll.
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (tk, h), 1)
    sel_h = (hi == iota_h).astype(jnp.float32)  # [tK, H]
    sel_rep = pltpu.repeat(sel_h, c_dim, axis=1)  # [tK, C*H] c-major tiling
    prod = p * sel_rep  # one nonzero h per (k, c)
    hc_c = jax.lax.broadcasted_iota(jnp.int32, (h * c_dim, c_dim), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h * c_dim, c_dim), 1)
    fold = (hc_c // h == cc).astype(jnp.bfloat16)  # [C*H, C] exact
    p_hi = prod.astype(jnp.bfloat16)
    r = prod - p_hi.astype(jnp.float32)
    p_mid = r.astype(jnp.bfloat16)
    p_lo = (r - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = sum(
        jax.lax.dot_general(
            part, fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for part in (p_hi, p_mid, p_lo)
    )  # [tK, C]; exactly one nonzero per (k, c): 3-way split is f32-exact
    out_ref[0] = out


def _round_up(v, m):
    return -(-v // m) * m


def _gather_kernel_t(idx_ref, f3_ref, out_ref, *, h, c_dim, tk):
    """Lane-major gather, h-select-matmul form.

    Per channel: ``gsel = F_c^T[L, H] @ onehotH[H, tK]`` pulls the
    whole 128-row block containing each index (one matmul per bf16
    part), then the l-selection is ONE elementwise multiply by the lo
    one-hot + a sublane reduce.  Compared to the earlier form (big
    [C*H, tK] f32 plane holding every (c, h) pair, masked by a repeated
    h-selector, folded with extra matmuls): same MAC count, but the
    widest VPU plane shrinks from [C*H, tK] to [L, tK] and the fold
    matmuls disappear — measured 5.78 -> 3.49 ms at C=3 / 2.1M rows,
    29.5 -> 18.0 at C=16, bitwise equal (bench/probe_r4_gather.py).

    Exactness: the one-hot factors are exact in bf16; the feature table
    is 3-way bf16 split (Dekker), so gsel reconstructs each f32 value
    exactly; the l-dot has exactly one nonzero term per column.
    """
    idx = idx_ref[0]  # [1, tK] lane-major indices
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
def gather_rows_t(features, idx, tk: int = 2048):
    """Transposed-layout twin of :func:`gather_rows` (same result, lanes
    carry the row axis throughout; h-select-matmul form — see
    _gather_kernel_t)."""
    features = jnp.asarray(features, jnp.float32)
    idx = jnp.asarray(idx, jnp.int32)
    b, n, c_dim = features.shape
    k = idx.shape[1]
    n_pad = _round_up(n, _L)
    h = n_pad // _L
    k_pad = _round_up(k, tk)
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, k_pad - k)))
    feat = jnp.pad(features, ((0, 0), (0, n_pad - n), (0, 0)))
    # per-channel [L, H] tables: f3[c, l, h] = feat[h*128 + l, c]
    f3 = jnp.transpose(feat.reshape(b, h, _L, c_dim), (0, 3, 2, 1))

    out = pl.pallas_call(
        functools.partial(_gather_kernel_t, h=h, c_dim=c_dim, tk=tk),
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


@functools.partial(jax.jit, static_argnames=("tk",))
def gather_rows(features, idx, tk: int = 2048):
    """out[b, k, :] = features[b, idx[b, k], :] (exact to <=1 ulp).

    Args:
      features: [B, N, C] float32.
      idx: [B, K] int32 in [0, N).

    Returns:
      [B, K, C] float32.
    """
    features = jnp.asarray(features, jnp.float32)
    idx = jnp.asarray(idx, jnp.int32)
    b, n, c_dim = features.shape
    k = idx.shape[1]
    n_pad = _round_up(n, _L)
    h = n_pad // _L
    k_pad = _round_up(k, tk)
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, k_pad - k)))
    feat = jnp.pad(features, ((0, 0), (0, n_pad - n), (0, 0)))
    # c-major table: [B, N', C] -> [B, H, L, C] -> [B, L, C, H] -> [B, L, C*H]
    f2 = jnp.transpose(
        feat.reshape(b, h, _L, c_dim), (0, 2, 3, 1)
    ).reshape(b, _L, c_dim * h)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, h=h, c_dim=c_dim, tk=tk),
        grid=(b, k_pad // tk),
        in_specs=[
            pl.BlockSpec((1, tk, 1), lambda bi, kc: (bi, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _L, c_dim * h), lambda bi, kc: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tk, c_dim), lambda bi, kc: (bi, kc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, c_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * k_pad * _L * c_dim * h,
            bytes_accessed=4 * b * (k_pad * (1 + c_dim) + n_pad * c_dim),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(idx[..., None], f2)
    return out[:, :k, :]
