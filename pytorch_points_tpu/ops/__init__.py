"""Public op surface — mirrors the reference's ``network/operations.py``
symbol set (SURVEY.md §3.2 P1) in channels-last layout."""

from pytorch_points_tpu.ops.chamfer import chamfer_distance, nndistance  # noqa: F401
from pytorch_points_tpu.ops.emd import earth_mover_distance  # noqa: F401
from pytorch_points_tpu.ops.grouping import (  # noqa: F401
    ball_query,
    group_all,
    group_knn,
    group_points,
    knn,
    sample_and_group,
    sample_and_group_sorted,
)
from pytorch_points_tpu.ops.interpolate import (  # noqa: F401
    interpolation_weights,
    three_interpolate,
    three_nn,
)
from pytorch_points_tpu.ops.normalize import (  # noqa: F401
    normalize_point_batch,
    normalize_to_box,
)
from pytorch_points_tpu.ops.normals import batch_normals  # noqa: F401
from pytorch_points_tpu.ops.pairwise import pairwise_sqdist  # noqa: F401
from pytorch_points_tpu.ops.voxel import voxel_downsample_mask  # noqa: F401
from pytorch_points_tpu.ops.sampling import (  # noqa: F401
    furthest_point_sample,
    furthest_point_sample_and_gather,
    gather_points,
    random_sample,
    scatter_add,
)
