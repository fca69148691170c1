"""PCA normal estimation (batch_normals).

Reference (SURVEY.md §3.1 N7, §3.2 P1): kNN neighborhoods -> per-point 3x3
covariance -> smallest eigenvector = normal.  The reference vendored a CUDA
batch-SVD kernel for this; on TPU a closed-form symmetric 3x3
eigendecomposition in pure jnp is both simpler and faster (no kernel
needed), computed entirely on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_points_tpu.ops.grouping import group_points, knn


def smallest_eigenvector_sym3x3(cov, eps: float = 1e-12):
    """Closed-form eigenvector of the smallest eigenvalue of symmetric 3x3.

    Args:
      cov: [..., 3, 3] symmetric matrices.

    Returns:
      [..., 3] unit eigenvectors (sign unspecified).

    Uses the trigonometric (Smith's) method for the eigenvalues followed by
    a cross-product construction of the eigenvector — branch-free and
    vmap/jit friendly, unlike LAPACK-style iterative SVD.
    """
    a = cov
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a_q = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps))
    bmat = a_q / p[..., None, None]
    # det(B)/2 clipped into [-1, 1]
    r = jnp.clip(jnp.linalg.det(bmat) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues: eig1 >= eig2 >= eig3
    eig1 = q + 2.0 * p * jnp.cos(phi)
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    # Eigenvector for eig3: columns of (A - eig1 I)(A - eig2 I) span it; use
    # the cross product of two rows of (A - eig3 I) instead (more stable).
    m = a - eig3[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    # Pick the largest cross product (rows may be parallel).
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3, 3]
    which = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    v = jnp.take_along_axis(best, which[..., None, None], -2)[
        ..., 0, :
    ]
    # Degenerate (isotropic) case: any unit vector is fine; fall back to z.
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))
    v = v / norm
    degenerate = (p2 < eps)[..., None]
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(degenerate, z, v)


def batch_normals(xyz, k: int = 20, mask=None, *, orient_outward: bool = False,
                  impl: str = "auto"):
    """Estimate per-point normals via local PCA over kNN neighborhoods.

    Args:
      xyz: [B, N, 3] points.
      k: neighborhood size.
      mask: optional [B, N] validity mask.
      orient_outward: flip normals to point away from the cloud centroid
        (the reference orients against a viewpoint; outward = viewpoint at
        the centroid with flipped sign).

    Returns:
      [B, N, 3] unit normals.
    """
    _, idx = knn(xyz, xyz, k, support_mask=mask, impl=impl)
    nbrs = group_points(xyz, idx)  # [B, N, k, 3]
    centered = nbrs - jnp.mean(nbrs, axis=2, keepdims=True)
    cov = jnp.einsum(
        "bnki,bnkj->bnij",
        centered,
        centered,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / k
    normals = smallest_eigenvector_sym3x3(cov)
    if orient_outward:
        if mask is None:
            centroid = jnp.mean(xyz, axis=1, keepdims=True)
        else:
            m = mask[..., None]
            centroid = jnp.sum(jnp.where(m, xyz, 0.0), 1, keepdims=True) / jnp.maximum(
                jnp.sum(mask, 1)[:, None, None], 1
            )
        outward = xyz - centroid
        sign = jnp.sign(jnp.sum(normals * outward, -1, keepdims=True))
        sign = jnp.where(sign == 0, 1.0, sign)
        normals = normals * sign
    if mask is not None:
        normals = jnp.where(mask[..., None], normals, 0.0)
    return normals
