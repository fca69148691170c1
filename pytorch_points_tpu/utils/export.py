"""Ahead-of-time model export for serving (beyond-reference subsystem).

The reference library has no deployment story at all (SURVEY.md §1: a
Python package imported by training scripts); the TPU-native equivalent
of "ship the trained model" is a serialized StableHLO artifact via
``jax.export`` — a single self-contained blob (weights baked in as
constants) that a serving host can load and run without the model code,
Python training stack, or this library installed at the same version.

Two-function API mirroring the checkpoint helpers (SURVEY.md §6):

    blob = export_forward(model, example_input)         # nnx module
    blob = export_fn(fn, example_args)                  # any jittable fn
    restored = load_exported(blob_or_path)
    y = restored(x)

Exports are per-platform: by default the artifact targets the platform
it was traced on (CPU exports run on CPU hosts, TPU exports carry the
Mosaic kernels as serialized custom calls).  Pass ``platforms`` for
cross-platform lowering (e.g. export FOR tpu from a CPU host —
the op dispatch follows the TRACING backend, so kernels ride the XLA
path in that case, which every op supports).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def export_fn(fn, example_args, *, path=None, platforms=None) -> bytes:
    """Serialize a jittable ``fn`` at the example arguments' shapes.

    Args:
      fn: a jittable callable; closed-over arrays (weights) are baked
        into the artifact as constants.
      example_args: tuple of example arguments (arrays or
        ShapeDtypeStructs) fixing the input signature.
      path: optional file to write the blob to.
      platforms: optional sequence of lowering platforms
        (e.g. ("tpu", "cpu")); default = the current backend.

    Returns:
      The serialized artifact bytes.
    """
    from jax import export as jexport

    if not isinstance(example_args, (tuple, list)):
        example_args = (example_args,)
    specs = tuple(
        jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))
        if not isinstance(a, jax.ShapeDtypeStruct) else a
        for a in example_args
    )
    exported = jexport.export(
        jax.jit(fn),
        platforms=None if platforms is None else tuple(platforms),
    )(*specs)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_forward(model, example_input, *, path=None,
                   platforms=None) -> bytes:
    """Serialize an nnx module's forward pass with its weights baked in.

    ``model`` is split into (graphdef, state); the state arrays become
    constants of the exported computation, so the artifact is fully
    self-contained — the serving host needs only jax.
    """
    from flax import nnx

    graphdef, state = nnx.split(model)

    def fwd(x):
        return nnx.merge(graphdef, state)(x)

    return export_fn(fwd, (example_input,), path=path, platforms=platforms)


def load_exported(blob_or_path):
    """Deserialize an exported artifact; returns a jit-callable.

    Accepts the bytes returned by :func:`export_fn`/:func:`export_forward`
    or a filesystem path to one.
    """
    from jax import export as jexport

    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jexport.deserialize(blob)

    def call(*args):
        return exported.call(*args)

    return call
