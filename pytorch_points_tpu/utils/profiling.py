"""Tracing / profiling (SURVEY.md §6).

The reference has no built-in profiling (users reach for
torch.autograd.profiler); here the TPU-native equivalents are first-class:

  * every public op runs under a ``jax.named_scope`` so HLO/XProf traces
    show `ppt.chamfer`, `ppt.fps`, ... instead of anonymous fusions;
  * :func:`trace` captures an XProf/Perfetto trace directory around any
    code block;
  * :func:`annotate` marks host-side phases (steps, data loading) on the
    trace timeline.
"""

from __future__ import annotations

import contextlib

import jax


def annotate(name: str):
    """Host-side timeline annotation (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def op_scope(name: str):
    """HLO-level scope used by every public op (named_scope)."""
    return jax.named_scope(f"ppt.{name}")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XProf trace of the enclosed block into ``log_dir``.

    View with xprof / tensorboard-plugin-profile, or convert the contained
    .trace.json.gz to Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
