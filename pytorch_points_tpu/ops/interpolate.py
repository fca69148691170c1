"""three_nn / three_interpolate — the FP-layer upsampling primitives.

Reference semantics (SURVEY.md §3.1 N6, §4.4): for each high-res point find
its 3 nearest low-res points (squared distances + indices), interpolate
low-res features with inverse-distance weights; the backward scatters
weighted gradients to the low-res points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_points_tpu.ops.grouping import knn


def three_nn(unknown, known, known_mask=None, impl: str = "auto"):
    """3 nearest neighbors of each high-res point among the low-res points.

    Args:
      unknown: [B, n, 3] high-res coordinates.
      known: [B, m, 3] low-res coordinates.
      known_mask: optional [B, m] validity mask.

    Returns:
      (dist [B, n, 3] squared distances ascending, idx [B, n, 3] int32).
    """
    return knn(unknown, known, 3, support_mask=known_mask, impl=impl)


def interpolation_weights(dist, eps: float = 1e-8):
    """Inverse-distance weights from (squared) three_nn distances.

    weights = (1/(d+eps)) / sum(1/(d+eps)) — the standard PointNet++ FP
    weighting used by the reference (SURVEY.md §4.4).
    """
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def _three_interp_forward(features, idx, weight):
    # features [B,m,C], idx [B,n,3], weight [B,n,3] -> [B,n,C]
    b, n, k = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(b, n * k)[..., None], axis=1
    ).reshape(b, n, k, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


@jax.custom_vjp
def _three_interpolate(features, idx, weight):
    return _three_interp_forward(features, idx, weight)


def _ti_fwd(features, idx, weight):
    out = _three_interp_forward(features, idx, weight)
    return out, (features, idx, weight)


def _ti_bwd(res, g):
    features, idx, weight = res
    b, m, c = features.shape
    n, k = idx.shape[1:]
    # d(out[b,n,:])/d(features[b,idx[b,n,j],:]) = weight[b,n,j]
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    wg = g[:, :, None, :] * weight[..., None]  # [B,n,k,C]
    grad_f = scatter_add_auto(
        idx.reshape(b, n * k), wg.reshape(b, n * k, c), m
    )
    # d(out)/d(weight[b,n,j]) = <g[b,n,:], features[b,idx[b,n,j],:]>
    gathered = jnp.take_along_axis(
        features, idx.reshape(b, n * k)[..., None], axis=1
    ).reshape(b, n, k, c)
    grad_w = jnp.sum(gathered * g[:, :, None, :], axis=-1)
    return grad_f, None, grad_w


_three_interpolate.defvjp(_ti_fwd, _ti_bwd)


def three_interpolate(features, idx, weight):
    """Weighted interpolation of low-res features onto high-res points.

    Args:
      features: [B, m, C] low-res features.
      idx: [B, n, 3] int32 indices from :func:`three_nn`.
      weight: [B, n, 3] interpolation weights (rows sum to 1).

    Returns:
      [B, n, C]; backward scatter-adds weighted grads to the m low-res
      points (reference: three_interpolate_grad kernel, SURVEY.md §4.4).
    """
    features = jnp.asarray(features)
    idx = jnp.asarray(idx).astype(jnp.int32)
    weight = jnp.asarray(weight, dtype=features.dtype)
    return _three_interpolate(features, idx, weight)
