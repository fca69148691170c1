"""Multi-device execution (SURVEY.md §3.3, §6).

The reference performs no inter-device communication at all (single-GPU
CUDA library); the TPU-native equivalents here are:

  * data parallelism: ``shard_map`` over a ``Mesh`` 'data' axis with
    ``psum``-averaged gradients (pytorch_points_tpu.parallel.train_step),
  * point/"sequence" parallelism: the support cloud sharded over a
    'points' axis with streaming argmin combination across devices
    (pytorch_points_tpu.parallel.chamfer_sharded) — structurally ring
    attention's KV rotation with argmin as the combinable statistic.

TP/PP/EP are deliberately absent: there is no tensor large enough to
split and no pipeline/experts in this model family (documented absence,
SURVEY.md §3.3).
"""

from pytorch_points_tpu.parallel.mesh import make_mesh  # noqa: F401
from pytorch_points_tpu.parallel.data_parallel import (  # noqa: F401
    TrainState,
    make_train_step,
    reconstruction_loss,
)
from pytorch_points_tpu.parallel.sharded_ops import (  # noqa: F401
    ball_query_sharded,
    chamfer_sharded,
    earth_mover_distance_sharded,
    furthest_point_sample_sharded,
    group_points_sharded,
    knn_sharded,
    three_interpolate_sharded,
    three_nn_sharded,
    nndistance_ring,
    nndistance_sharded,
    sample_and_group_sharded,
)
