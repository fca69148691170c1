"""Shared scatter-add dispatch for all custom_vjp backward passes.

The reference's backward kernels are atomicAdd scatters (SURVEY.md §3.1);
here every backward funnels through this one primitive: the MXU one-hot
matmul kernel on TPU (kernels/scatter.py, ~6x faster than XLA's scatter
at training scale), XLA's deterministic indexed-add elsewhere and for
small problems.
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorch_points_tpu.kernels import dispatch

# Below this many updates the one-hot matmul's fixed costs beat its gains.
_MIN_PALLAS_UPDATES = 4096


def scatter_add_auto(idx, updates, n: int, impl: str = "auto"):
    """out[b, idx[b,k], c] += updates[b,k,c]; out is [B, n, C] of zeros.

    Extra leading batch dims (e.g. from vmap-of-grad) are flattened in and
    restored."""
    idx = jnp.asarray(idx)
    updates = jnp.asarray(updates)
    if idx.ndim > 2:
        lead = idx.shape[:-1]
        out = scatter_add_auto(
            idx.reshape(-1, idx.shape[-1]),
            updates.reshape(-1, updates.shape[-2], updates.shape[-1]),
            n,
            impl,
        )
        return out.reshape(*lead, n, updates.shape[-1])
    resolved = dispatch.resolve(impl, "scatter")
    if resolved == "pallas" and idx.shape[1] >= _MIN_PALLAS_UPDATES:
        from pytorch_points_tpu.kernels.scatter import scatter_add_csum_t

        # lane-major formulation: 3.6x the original kernel (2.1 vs 7.6 ms
        # per 2M updates into [32,16384,3]), bit-identical results.  The
        # kernel accumulates in f32; restore the caller's dtype so bf16
        # custom_vjp backwards return bf16 cotangents (dtype mismatch
        # here is a hard error under value_and_grad).
        return scatter_add_csum_t(idx, updates, n).astype(updates.dtype)
    b, k = idx.shape
    c = updates.shape[-1]
    # One-hot MXU contraction when the [B,K,n] plane is cheap: XLA's TPU
    # scatter executes serially per element (~9 ns), so even a few million
    # updates cost tens of ms, while the equivalent one-hot matmul is a
    # couple of microseconds.  HIGHEST keeps f32 accuracy (the one-hot
    # factor is exact in bf16; XLA splits the f32 updates internally).
    if b * k * n * 4 <= 64 * 1024 * 1024 and b * k * n * c <= 4 * 10**9:
        import jax

        onehot = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(
            updates.dtype
        )  # [B, K, n]
        return jnp.einsum(
            "bkm,bkc->bmc", onehot, updates,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(updates.dtype)
    # Row-form indexed add (window over C): one scatter row per update,
    # never the element-wise lowering.
    out = jnp.zeros((b, n, c), updates.dtype)
    return out.at[jnp.arange(b)[:, None], idx].add(updates)
