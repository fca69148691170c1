"""On-device voxel-grid downsampling (static-shape, mask-returning).

The host-side C++ path (csrc/ppt_native.cpp grid_subsample) averages
points per cell and returns a variable-size cloud — fine on the host,
impossible under jit.  The device variant keeps the FIRST valid point of
each occupied voxel (lowest index, the library-wide tie rule) and
returns an updated validity MASK, composing with every masked op and
with data.augment.random_dropout.
"""

from __future__ import annotations

import jax.numpy as jnp

_BITS = 10  # cells per axis = 2^10; 3 axes pack into one int32 key


def voxel_downsample_mask(xyz, cell: float, mask=None):
    """Keep-mask selecting one representative point per occupied voxel.

    Args:
      xyz: [B, N, 3] coordinates.
      cell: voxel edge length.  The grid is anchored at each cloud's
        valid minimum corner and supports up to 1024 cells per axis
        (plenty for normalized clouds; coordinates beyond that are
        clamped into the boundary cells).
      mask: optional [B, N] validity mask; invalid points never become
        representatives and stay invalid in the result.

    Returns:
      [B, N] bool — True for the lowest-index valid point of each voxel.
    """
    xyz = jnp.asarray(xyz)
    b, n, _ = xyz.shape
    if mask is None:
        valid = jnp.ones((b, n), bool)
    else:
        valid = jnp.asarray(mask, bool)

    lo = jnp.min(
        jnp.where(valid[..., None], xyz, jnp.inf), axis=1, keepdims=True
    )
    g = jnp.floor((xyz - lo) / cell).astype(jnp.int32)
    g = jnp.clip(g, 0, (1 << _BITS) - 1)
    key = (g[..., 0] << (2 * _BITS)) | (g[..., 1] << _BITS) | g[..., 2]
    # invalid points sort last and never match a real voxel key
    key = jnp.where(valid, key, jnp.int32((1 << 30) + 1))

    order = jnp.argsort(key, axis=1, stable=True)  # ties -> lowest index
    skey = jnp.take_along_axis(key, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1
    )
    inv = jnp.argsort(order, axis=1)
    keep = jnp.take_along_axis(first, inv, axis=1)
    return jnp.logical_and(keep, valid)
