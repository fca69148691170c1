"""Cloud normalization (reference operations.py composites, SURVEY.md §3.2 P1)."""

from __future__ import annotations

import jax.numpy as jnp


def _masked_stats(xyz, mask):
    if mask is None:
        centroid = jnp.mean(xyz, axis=-2, keepdims=True)
        return centroid, None
    m = mask[..., None]
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1)[..., None, None]
    centroid = jnp.sum(jnp.where(m, xyz, 0.0), axis=-2, keepdims=True) / cnt
    return centroid, m


def normalize_point_batch(xyz, mask=None):
    """Center each cloud and scale to the unit sphere.

    Returns:
      (normalized [B,N,3], centroid [B,1,3], furthest_distance [B,1,1])
      such that ``normalized = (xyz - centroid) / furthest_distance`` —
      matching the reference's normalize_point_batch contract.
    """
    xyz = jnp.asarray(xyz)
    centroid, m = _masked_stats(xyz, mask)
    centered = xyz - centroid
    r = jnp.linalg.norm(centered, axis=-1, keepdims=True)  # [B,N,1]
    if m is not None:
        r = jnp.where(m, r, 0.0)
    furthest = jnp.max(r, axis=-2, keepdims=True)  # [B,1,1]
    furthest = jnp.maximum(furthest, 1e-12)
    out = centered / furthest
    if m is not None:
        out = jnp.where(m, out, 0.0)
    return out, centroid, furthest


def normalize_to_box(xyz, mask=None):
    """Center to the bounding-box center and scale the longest edge to 2
    (cloud fits in [-1, 1]^3).

    Returns:
      (normalized, center [B,1,3], scale [B,1,1]) with
      ``normalized = (xyz - center) / scale``.
    """
    xyz = jnp.asarray(xyz)
    if mask is not None:
        m = mask[..., None]
        big = jnp.float32(1e30)
        mx = jnp.max(jnp.where(m, xyz, -big), axis=-2, keepdims=True)
        mn = jnp.min(jnp.where(m, xyz, big), axis=-2, keepdims=True)
    else:
        m = None
        mx = jnp.max(xyz, axis=-2, keepdims=True)
        mn = jnp.min(xyz, axis=-2, keepdims=True)
    center = (mx + mn) / 2.0
    scale = jnp.maximum(jnp.max(mx - mn, axis=-1, keepdims=True) / 2.0, 1e-12)
    out = (xyz - center) / scale
    if m is not None:
        out = jnp.where(m, out, 0.0)
    return out, center, scale
