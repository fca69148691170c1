"""On-device point-cloud augmentation (jit/vmap-compatible, keyed).

The reference augments on the host in numpy (utils/pc_utils.py has the
matching `jitter_perturbation_point_cloud` / `rotate_point_cloud`); on
TPU the natural place is inside the jitted train step, keyed by a
`jax.random` PRNGKey so the whole input pipeline stays on device and
reproducible.  All functions take and return [B, N, 3] batches and
respect validity masks (padded points are left untouched so poison/pad
conventions survive augmentation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_masked(xyz, new_xyz, mask):
    if mask is None:
        return new_xyz
    return jnp.where(mask[..., None], new_xyz, xyz)


def jitter(key, xyz, sigma: float = 0.01, clip: float = 0.05, mask=None):
    """Add clipped gaussian noise per point ([B,N,3] -> [B,N,3])."""
    noise = sigma * jax.random.normal(key, xyz.shape, xyz.dtype)
    noise = jnp.clip(noise, -clip, clip)
    return _apply_masked(xyz, xyz + noise, mask)


def _axis_rotations(angle, axis: str):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis == "x":
        rows = ((one, zero, zero), (zero, c, -s), (zero, s, c))
    elif axis == "y":
        rows = ((c, zero, s), (zero, one, zero), (-s, zero, c))
    elif axis == "z":
        rows = ((c, -s, zero), (s, c, zero), (zero, zero, one))
    else:
        raise ValueError(f"axis must be x/y/z, got {axis!r}")
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)  # [..., 3, 3]


def rotate(key, xyz, normals=None, axis: str = "y", mask=None):
    """Random per-cloud rotation about one axis ([B,N,3] -> [B,N,3]).

    Returns ``xyz_rot`` or ``(xyz_rot, normals_rot)`` when normals are
    given (normals rotate with the same matrix; rotations preserve
    length so no renormalization is needed).
    """
    b = xyz.shape[0]
    angle = jax.random.uniform(key, (b,), xyz.dtype, 0.0, 2.0 * jnp.pi)
    rot = _axis_rotations(angle, axis)  # [B, 3, 3]
    # Full-precision contraction: TPU's default bf16 matmul loses ~1e-2
    # relative on the rotated coordinates, which breaks the op's
    # length-preservation contract.  The op is [B,N,3]x[B,3,3] — tiny.
    hi = jax.lax.Precision.HIGHEST
    out = _apply_masked(
        xyz, jnp.einsum("bnj,bij->bni", xyz, rot, precision=hi), mask
    )
    if normals is None:
        return out
    nrm = jnp.einsum("bnj,bij->bni", normals, rot, precision=hi)
    return out, _apply_masked(normals, nrm, mask)


def random_scale(key, xyz, lo: float = 0.8, hi: float = 1.25, mask=None):
    """Uniform per-cloud isotropic scale ([B,N,3] -> [B,N,3])."""
    b = xyz.shape[0]
    s = jax.random.uniform(key, (b, 1, 1), xyz.dtype, lo, hi)
    return _apply_masked(xyz, xyz * s, mask)


def random_dropout(key, xyz, max_ratio: float = 0.5, mask=None):
    """Randomly invalidate up to ``max_ratio`` of each cloud's points.

    Static-shape analog of PointNet++'s random input dropout: instead of
    removing points (dynamic shape), it returns an updated validity MASK
    with dropped points marked invalid — feed it to the masked ops.
    Already-invalid points stay invalid.  Returns (xyz, new_mask).
    """
    b, n, _ = xyz.shape
    kr, kd = jax.random.split(key)
    ratio = jax.random.uniform(kr, (b, 1), xyz.dtype, 0.0, max_ratio)
    drop = jax.random.uniform(kd, (b, n), xyz.dtype) < ratio
    keep = ~drop
    if mask is not None:
        keep = jnp.logical_and(keep, mask)
        # never drop EVERY valid point: if a draw would, restore the
        # original mask for that cloud
        any_left = keep.any(axis=1, keepdims=True)
        keep = jnp.where(any_left, keep, mask)
    else:
        any_left = keep.any(axis=1, keepdims=True)
        keep = jnp.where(any_left, keep, True)
    return xyz, keep
