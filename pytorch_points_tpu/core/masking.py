"""Static-shape padding, masks and bucketing.

XLA traces each distinct shape once; ragged point clouds therefore become
(padded array, boolean mask) pairs.  Two invariants every op in the
framework must satisfy (consolidated in tests/test_masking.py, with
finite-difference backward checks in tests/test_gradcheck.py):

  1. a padded (invalid) point never wins an argmin / argmax / top-k and is
     never returned as a neighbor index;
  2. a padded point receives zero gradient.

The standard trick used throughout the kernels is *poisoning*: invalid
points get their coordinates replaced by a large finite constant so that
any distance to them is astronomically large — keeping the hot Pallas
kernels entirely mask-free (masks are applied only at the cheap edges).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

# Large-but-finite poison offset.  Distances to poisoned points are
# ~(2 * BIG_COORD)^2 = 1.6e9, far above any real squared distance for
# normalized clouds, while (BIG)^2 stays comfortably inside float32.
BIG_COORD = 2.0e4
BIG_DISTANCE = 1.0e9


def lengths_to_mask(lengths, max_len: int):
    """[B] int lengths -> [B, max_len] bool validity mask."""
    lengths = jnp.asarray(lengths)
    idx = jnp.arange(max_len)[None, :]
    return idx < lengths[:, None]


# Alias matching the more common naming in other libraries.
mask_from_lengths = lengths_to_mask


def poison_points(xyz, mask, sign: float = 1.0):
    """Replace invalid points' coordinates with a far-away constant.

    With per-invalid-point *distinct* offsets along the first coordinate so
    two poisoned points are also far from each other (keeps FPS/knn honest
    even if both clouds are padded).
    """
    if mask is None:
        return xyz
    n = xyz.shape[-2]
    # Distinct offsets per padded slot: BIG + i * 4, so padded points are
    # mutually distant as well.
    offs = BIG_COORD + 4.0 * jnp.arange(n, dtype=xyz.dtype)
    poison = jnp.zeros_like(xyz).at[..., 0].set(sign * offs)
    m = mask[..., None]
    return jnp.where(m, xyz, poison)


def pad_points(xyz, target_n: int, axis: int = -2):
    """Pad a cloud with zeros along the point axis up to ``target_n``.

    Returns (padded, mask) where mask marks the original points.  Accepts a
    single cloud [N, C] or a batch [B, N, C].
    """
    xyz = jnp.asarray(xyz)
    axis = axis % xyz.ndim
    n = xyz.shape[axis]
    if n > target_n:
        raise ValueError(f"cloud has {n} points > target {target_n}")
    pad_widths = [(0, 0)] * xyz.ndim
    pad_widths[axis] = (0, target_n - n)
    padded = jnp.pad(xyz, pad_widths)
    mask_shape = list(xyz.shape[:axis]) + [target_n]
    mask = jnp.zeros(mask_shape, dtype=bool).at[..., :n].set(True)
    return padded, mask


def bucket_sizes(
    sizes: Sequence[int],
    *,
    multiple: int = 256,
    max_buckets: int = 8,
) -> list[int]:
    """Choose static bucket sizes covering the given cloud sizes.

    Buckets are multiples of ``multiple`` (TPU lane-friendly); each size is
    padded up to the smallest covering bucket.  Greedy: start from the
    rounded-up maximum, add a bucket whenever the padding waste of the
    current assignment exceeds ~25%, capped at ``max_buckets`` buckets.

    Pure host-side Python (runs at data-pipeline time, not under jit).
    """
    if not sizes:
        return []
    uniq = sorted({int(math.ceil(s / multiple)) * multiple for s in sizes})
    if len(uniq) <= max_buckets:
        return uniq
    # Quantile-spread selection, always keeping the max.
    picks = {uniq[-1]}
    for q in range(1, max_buckets):
        picks.add(uniq[int(round(q * (len(uniq) - 1) / max_buckets))])
    return sorted(picks)


def pad_to_bucket(xyz, buckets: Sequence[int]):
    """Pad a single cloud [N, C] to its covering bucket; returns (padded, mask)."""
    n = xyz.shape[-2]
    for b in sorted(buckets):
        if n <= b:
            return pad_points(xyz, b)
    raise ValueError(f"no bucket >= {n} in {list(buckets)}")
