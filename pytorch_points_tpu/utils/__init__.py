"""Utilities: point-cloud I/O, mesh I/O, checkpointing, benchmarking
(reference utils/, SURVEY.md §3.2 P5-P7)."""

from pytorch_points_tpu.utils import geometry_utils, pc_utils  # noqa: F401
from pytorch_points_tpu.utils.benchmark import device_sync, measure  # noqa: F401
from pytorch_points_tpu.utils import profiling  # noqa: F401
from pytorch_points_tpu.utils.train_utils import (  # noqa: F401
    check_values,
    clamp_gradients,
    linear_loss_weight,
    step_lr_schedule,
    warmup_cosine_lr_schedule,
    load_network,
    save_network,
    weights_init,
)
from pytorch_points_tpu.utils.trainer import Trainer  # noqa: F401
from pytorch_points_tpu.utils.export import (  # noqa: F401
    export_fn,
    export_forward,
    load_exported,
)
