"""Implementation dispatch: Pallas on TPU, XLA elsewhere.

Every public op accepts ``impl`` in {"auto", "pallas", "xla"}.
"auto" resolves to "pallas" on a TPU backend (or when interpret-mode is
forced for tests) and "xla" otherwise.
"""

from __future__ import annotations

import functools
import os

import jax

_FORCE = None  # test hook: "pallas" | "xla" | None


def force_impl(impl):
    """Globally force an implementation (None to clear). For tests."""
    global _FORCE
    _FORCE = impl


@functools.cache
def _default_impl() -> str:
    if os.environ.get("PPT_FORCE_IMPL") in ("pallas", "xla"):
        return os.environ["PPT_FORCE_IMPL"]
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def resolve(impl: str, op: str | None = None) -> str:
    """Resolve the implementation for ``op``.

    "auto" picks Pallas on TPU *if* the op's kernel has landed
    (kernels.AVAILABLE), else XLA.  An explicit "pallas" is honored
    unconditionally (raises if missing — used by kernel tests).
    """
    if _FORCE is not None:
        impl = _FORCE
    if impl == "auto":
        impl = _default_impl()
        if impl == "pallas" and op is not None:
            from pytorch_points_tpu import kernels

            if op not in kernels.AVAILABLE:
                return "xla"
    if impl not in ("pallas", "xla"):
        raise ValueError(f"impl must be auto|pallas|xla, got {impl!r}")
    return impl


def interpret_mode() -> bool:
    """Whether pallas_call should run in interpreter mode (non-TPU backend)."""
    return jax.default_backend() != "tpu"
