"""Composite losses (reference model_loss.py, SURVEY.md §3.2 P2)."""

from pytorch_points_tpu.losses.losses import (  # noqa: F401
    ChamferLoss,
    EMDLoss,
    MeshEdgeLengthLoss,
    MeshLaplacianLoss,
    NormalLoss,
    PointEdgeLengthLoss,
    PointLaplacianLoss,
    RepulsionLoss,
    SmapeLoss,
    UniformLoss,
)

from pytorch_points_tpu.losses.metrics import (  # noqa: F401
    chamfer_l1,
    coverage_and_mmd,
    fscore,
    hausdorff_distance,
    one_nn_accuracy,
)
