"""Core primitives: masking, padding/bucketing, dtype policy.

The reference library (SURVEY.md §3.1) handled variable-size clouds with
ragged per-point CUDA threads.  XLA requires static shapes, so every op in
this framework takes an optional boolean validity ``mask`` (``True`` =
real point) and the core layer provides padding / bucketing helpers that
make masks invisible to the common case.
"""

from pytorch_points_tpu.core.masking import (  # noqa: F401
    BIG_DISTANCE,
    bucket_sizes,
    lengths_to_mask,
    mask_from_lengths,
    pad_points,
    pad_to_bucket,
    poison_points,
)
from pytorch_points_tpu.core.dtypes import (  # noqa: F401
    accum_dtype,
    compute_dtype,
)
