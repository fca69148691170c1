"""Network layers (reference layers.py, SURVEY.md §3.2 P3) as flax.nnx
modules in channels-last layout."""

from pytorch_points_tpu.layers.blocks import SharedMLP  # noqa: F401
from pytorch_points_tpu.layers.edgeconv import DenseEdgeConv  # noqa: F401
from pytorch_points_tpu.layers.pointnet2 import (  # noqa: F401
    PointNetFPModule,
    PointNetSAModule,
)
