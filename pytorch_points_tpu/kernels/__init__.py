"""Pallas TPU kernels (SURVEY.md §8.1 `kernels/`).

Each kernel family registers itself in ``AVAILABLE`` once implemented;
``dispatch.resolve(impl, op)`` falls back to the XLA path for ops whose
Pallas kernel has not landed yet, so the library always works end-to-end on
every backend.
"""

from pytorch_points_tpu.kernels import dispatch  # noqa: F401

# Ops with a Pallas kernel implementation. Kept in sync by hand as kernels
# land (tests assert every name here actually imports).
AVAILABLE: frozenset[str] = frozenset(
    {"chamfer", "fps", "ball_query", "emd", "knn", "scatter", "gather"}
)
