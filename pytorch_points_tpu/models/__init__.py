"""Model families built from the SA/FP/DenseEdgeConv layers.

The reference is a library consumed by 3PU/DSS/Neural Cages training code
(SURVEY.md §1); these models reproduce the canonical downstream
architectures so the framework is usable end-to-end (BASELINE config 5)."""

from pytorch_points_tpu.models.pointnet2 import (  # noqa: F401
    PointCloudAutoencoder,
    PointNet2Classifier,
    PointNet2Encoder,
    PointNet2SemSeg,
)
from pytorch_points_tpu.models.cage_deformer import CageDeformer  # noqa: F401
from pytorch_points_tpu.models.upsampler import PointUpsampler  # noqa: F401
