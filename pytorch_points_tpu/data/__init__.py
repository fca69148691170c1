"""Host-side data pipeline: datasets + bucketed batching.

The reference ships no data loader (SURVEY.md §1); downstream repos
hand-rolled theirs.  On TPU a loader is load-bearing: XLA recompiles per
shape, so variable-size clouds must be padded into a small set of static
buckets (SURVEY.md §8.4 hard-part 3).  This package provides exactly that:

  * :class:`PlyFolderDataset` — a folder of .ply files (C++ fast parsing
    when built) with optional preprocessing,
  * :class:`BucketedBatcher` — groups clouds by bucketed size into padded
    (points, mask) batches, one static shape per bucket,
  * :class:`Prefetcher` — background-thread batch prefetch (host I/O +
    padding overlapped with device compute),
  * :mod:`augment` — keyed on-device augmentation (jitter/rotate/scale/
    dropout) for inside the jitted train step.
"""

from pytorch_points_tpu.data import augment  # noqa: F401
from pytorch_points_tpu.data.loader import (  # noqa: F401
    BucketedBatcher,
    Prefetcher,
    PlyFolderDataset,
    random_clouds,
)
