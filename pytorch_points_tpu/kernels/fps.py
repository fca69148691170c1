"""Pallas furthest-point-sampling kernel (SURVEY.md §3.1 N3, §4.2).

TPU mapping decisions (vs the reference's one-CUDA-block-per-batch design):
  * The k-step loop is inherently serial, so the whole batch is processed
    *inside one kernel program* — every per-step reduction runs over a
    [B, N] plane at full VPU width, amortizing loop overhead over B
    (k iterations total instead of B*k).
  * Coordinates live as three [B, N] planes and the running min-distance
    stays resident in VMEM across all k steps (the CUDA kernel's
    shared-memory array, scaled up).
  * The selected point's coordinates are extracted with a one-hot masked
    reduction (iota == sel) — per-row dynamic lane indexing does not
    vectorize on the VPU.
  * Tie-breaking: argmax resolves to the lowest index (max, then min over
    matching-iota candidates), matching the oracle and the reference.

Masked/padded points enter with min-distance -inf so they are never
selected and never perturb the running distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.kernels.dispatch import interpret_mode

_IDX_BIG = 2**30


def _fps_kernel(xyz_ref, init_ref, out_ref, mind_ref, *, k):
    x = xyz_ref[0]  # [B, N]
    y = xyz_ref[1]
    z = xyz_ref[2]
    mind_ref[:] = init_ref[:]
    b, n = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, _):
        mind = mind_ref[:]
        m = jnp.max(mind, axis=1, keepdims=True)  # [B, 1]
        cand = jnp.where(mind == m, iota, _IDX_BIG)
        sel = jnp.min(cand, axis=1, keepdims=True)  # [B, 1] lowest-index tie
        # One-hot lane write (dynamic single-lane vector stores don't lower
        # on Mosaic; this full-plane select is cheap since k << N).
        out_ref[:] = jnp.where(iota_k == j, sel, out_ref[:])
        onehot = iota == sel
        sx = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        sy = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        sz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        dx = x - sx
        dy = y - sy
        dz = z - sz
        d = dx * dx + dy * dy + dz * dz
        mind_ref[:] = jnp.minimum(mind, d)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _round_up(v, m):
    return -(-v // m) * m


# VMEM budget: 3 coord planes + init + mind + temporaries, f32.
_MAX_PLANE_BYTES = 16 * 1024 * 1024  # per [B, N] f32 plane (v5e VMEM ~128MB)


@functools.partial(jax.jit, static_argnames=("k",))
def furthest_point_sample(xyz, k: int, mask=None):
    """[B, N, 3] -> [B, k] int32 FPS indices (index-identical to oracle)."""
    # Integer-only outputs: sever the tangent path so pallas_call is
    # never traced by JVP (it has no AD rules).
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz, jnp.float32))
    b, n, _ = xyz.shape

    bp = _round_up(b, 8)
    np_ = _round_up(n, 128)
    if bp * np_ * 4 > _MAX_PLANE_BYTES:
        # Split the batch; each chunk still vectorizes fully.
        rows = max(8, _MAX_PLANE_BYTES // (np_ * 4) // 8 * 8)
        if rows < 8 or np_ * 4 * 8 > _MAX_PLANE_BYTES:
            # N too large for VMEM residency — XLA fallback.
            from pytorch_points_tpu.ops.sampling import _fps_xla

            return _fps_xla(xyz, k, mask)
        outs = []
        for s in range(0, b, rows):
            outs.append(
                furthest_point_sample(
                    xyz[s : s + rows],
                    k,
                    None if mask is None else mask[s : s + rows],
                )
            )
        return jnp.concatenate(outs, axis=0)

    if mask is None:
        init = jnp.full((b, n), 1e10, jnp.float32)
    else:
        init = jnp.where(mask, jnp.float32(1e10), -jnp.inf)
    # Pad: extra rows are dummy clouds (sliced off), extra cols are
    # never-selectable (-inf).
    init = jnp.pad(init, ((0, bp - b), (0, np_ - n)), constant_values=-jnp.inf)
    if bp > b:
        # Dummy rows are all -inf which would tie everywhere; give them one
        # valid slot so argmax stays well-defined.
        init = init.at[b:, 0].set(1e10)
    planes = jnp.pad(
        jnp.transpose(xyz, (2, 0, 1)), ((0, 0), (0, bp - b), (0, np_ - n))
    )  # [3, B', N']

    out = pl.pallas_call(
        functools.partial(_fps_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((bp, k), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bp, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # coord planes + init + mind + per-step temporaries; the
            # default scoped limit is only 16 MB (v5e VMEM: 128 MB)
            vmem_limit_bytes=min(
                112 * 1024 * 1024, max(32, 12 * bp * np_ * 4 // (1 << 20) + 8)
                * 1024 * 1024,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * bp * np_ * k, bytes_accessed=4 * bp * (3 * np_ + k),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(planes, init)
    return out[:b]
