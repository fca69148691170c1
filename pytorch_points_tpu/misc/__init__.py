"""Misc: logging (reference misc/, SURVEY.md §3.2 P8)."""

from pytorch_points_tpu.misc.logger import get_logger  # noqa: F401
