"""Shared pairwise squared-distance primitive.

This is the single most reused computation in the framework (SURVEY.md §4.1:
chamfer, EMD, kNN, ball query and three_nn all contain the O(N*M) distance
scan).  The XLA form below uses the matmul decomposition
``|p|^2 + |q|^2 - 2 p.q`` so the inner contraction lands on the MXU; the
Pallas kernels in `pytorch_points_tpu.kernels` compute the same quantity in
streamed VMEM tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(p, q):
    """Squared euclidean distances between two point sets.

    Args:
      p: [..., N, C] points.
      q: [..., M, C] points.

    Returns:
      [..., N, M] squared distances, clamped at 0 (guards tiny negative
      values from the matmul decomposition).
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    p2 = jnp.sum(p * p, axis=-1)[..., :, None]
    q2 = jnp.sum(q * q, axis=-1)[..., None, :]
    # precision=HIGHEST: TPU matmuls default to bf16 multiplicands, whose
    # ~2^-8 relative error breaks the 1e-5 distance-fidelity bar and flips
    # argmins (observed on hardware).  HIGHEST = 3-pass f32.
    cross = jnp.einsum(
        "...nc,...mc->...nm",
        p,
        q,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(p2 + q2 - 2.0 * cross, 0.0)
