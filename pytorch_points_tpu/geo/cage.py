"""Cage-based deformation: mean value coordinates (Neural Cages lineage).

The reference library is the utility layer under Yifan Wang's Neural Cages
project (SURVEY.md §1); the core geometric primitive there is deforming a
shape by a coarse triangular cage via generalized barycentric coordinates.
This is the TPU-native implementation: mean value coordinates for closed
triangle meshes (Ju, Schaefer & Warren 2005), fully vectorized over
(points x faces) with masked branches instead of control flow — jit/vmap/
grad friendly.

Typical use: weights are computed ONCE for the source cage (they depend
only on source geometry) and deformation is then a single [P, Vc] x
[Vc, 3] matmul per step — ideal for the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def mean_value_coordinates(points, cage_verts, cage_faces):
    """MVC weights of points w.r.t. a closed triangular cage.

    Args:
      points: [P, 3] query points (strictly inside or outside the cage;
        points exactly on the cage surface resolve to the containing
        face's barycentric weights).
      cage_verts: [Vc, 3].
      cage_faces: [F, 3] int32 (consistent outward winding).

    Returns:
      [P, Vc] weights, rows summing to 1; ``weights @ cage_verts``
      reproduces ``points`` (reproduction property, tested).
    """
    points = jnp.asarray(points, jnp.float32)
    cage_verts = jnp.asarray(cage_verts, jnp.float32)
    f = jnp.asarray(cage_faces, jnp.int32)
    pn, vc = points.shape[0], cage_verts.shape[0]

    diff = cage_verts[None, :, :] - points[:, None, :]  # [P, Vc, 3]
    d = jnp.linalg.norm(diff, axis=-1)  # [P, Vc]
    d = jnp.maximum(d, _EPS)
    u = diff / d[..., None]  # unit vectors [P, Vc, 3]

    uf = u[:, f, :]  # [P, F, 3, 3]
    df = d[:, f]  # [P, F, 3]

    # edge lengths between unit vectors, opposite each corner
    l0 = jnp.linalg.norm(uf[:, :, 1] - uf[:, :, 2], axis=-1)
    l1 = jnp.linalg.norm(uf[:, :, 2] - uf[:, :, 0], axis=-1)
    l2 = jnp.linalg.norm(uf[:, :, 0] - uf[:, :, 1], axis=-1)
    lv = jnp.stack([l0, l1, l2], axis=-1)  # [P, F, 3]
    theta = 2.0 * jnp.arcsin(jnp.clip(lv / 2.0, 0.0, 1.0))  # [P, F, 3]
    h = jnp.sum(theta, axis=-1) / 2.0  # [P, F]

    # interior/face test: x lies on face t when pi - h ~ 0
    on_face = (jnp.pi - h) < 1e-5  # [P, F]
    sin_t = jnp.sin(theta)
    # barycentric-style weights for the on-face case
    w_face = (
        sin_t
        * jnp.roll(df, 1, axis=-1)
        * jnp.roll(df, 2, axis=-1)
    )  # [P, F, 3]

    sin_h = jnp.sin(h)[..., None]
    c = (2.0 * sin_h * jnp.sin(h[..., None] - theta)) / jnp.maximum(
        jnp.roll(sin_t, 1, -1) * jnp.roll(sin_t, 2, -1), _EPS
    ) - 1.0
    det = jnp.linalg.det(uf)  # [P, F]
    s = jnp.sign(det)[..., None] * jnp.sqrt(
        jnp.clip(1.0 - c**2, 0.0, None)
    )  # [P, F, 3]
    degenerate = jnp.any(jnp.abs(s) <= _EPS, axis=-1)  # coplanar, outside

    w = (theta - jnp.roll(c, 1, -1) * jnp.roll(theta, 2, -1)
         - jnp.roll(c, 2, -1) * jnp.roll(theta, 1, -1)) / jnp.maximum(
        jnp.abs(df * jnp.roll(sin_t, 1, -1) * jnp.roll(s, 2, -1)), _EPS
    ) * jnp.sign(df * jnp.roll(sin_t, 1, -1) * jnp.roll(s, 2, -1))
    w = jnp.where(degenerate[..., None], 0.0, w)  # [P, F, 3]

    # any point on some face: use only that face's barycentric weights
    any_on_face = jnp.any(on_face, axis=-1, keepdims=True)  # [P, 1]
    w = jnp.where(
        any_on_face[..., None],
        jnp.where(on_face[..., None], w_face, 0.0),
        w,
    )

    # scatter per-face corner weights onto cage vertices
    flat_f = f.reshape(-1)  # [F*3]
    w_flat = w.reshape(pn, -1)  # [P, F*3]
    weights = jax.vmap(
        lambda row: jax.ops.segment_sum(row, flat_f, num_segments=vc)
    )(w_flat)
    total = jnp.sum(weights, axis=-1, keepdims=True)
    return weights / jnp.where(jnp.abs(total) < _EPS, 1.0, total)


def deform_with_cage(weights, new_cage_verts):
    """[..., P, Vc] MVC weights x [Vc, 3] deformed cage -> [..., P, 3]."""
    return jnp.einsum(
        "...pv,vc->...pc",
        weights,
        jnp.asarray(new_cage_verts, jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
