"""Pallas furthest-point-sampling kernel (SURVEY.md §3.1 N3, §4.2).

TPU mapping decisions (vs the reference's one-CUDA-block-per-batch design):
  * The k-step loop is inherently serial, so the whole batch is processed
    *inside one kernel program* — every per-step reduction runs over a
    [B, N] plane at full VPU width, amortizing loop overhead over B
    (k iterations total instead of B*k).
  * Coordinates live as three [B, N] planes and the running min-distance
    stays resident in VMEM across all k steps (the CUDA kernel's
    shared-memory array, scaled up).
  * Each step processes the planes in [B, cs] column chunks (two passes:
    update+max, then argmin+coord-extract) so the register live-set stays
    bounded — full-plane ops at N=131072 spilled ~100 MB of registers.
    VMEM residency covers B*N*4 plane bytes up to ~20 MB; larger batches
    are split into row groups, so any N <= ~650k runs the Pallas path.
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


def _fps_kernel(xyz_ref, init_ref, out_ref, *rest, k, cs):
    # rest = (coords_ref,) mind_ref — coords_ref present iff emit_coords.
    coords_ref = rest[0] if len(rest) == 2 else None
    mind_ref = rest[-1]
    mind_ref[:] = init_ref[:]
    _, b, n = xyz_ref.shape
    nchunks = n // cs
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (b, cs), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.zeros_like(out_ref)
    if coords_ref is not None:
        coords_ref[:] = jnp.zeros_like(coords_ref)
        iota_kf = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(j, carry):
        # carry: coords of the previously selected point per batch row.
        # At j=0 there is no previous point: the min-fold is skipped
        # (j > 0 select below) so the argmax runs on the raw init values
        # and selects the first valid index — the reference seeding —
        # with no dependence on the clouds' coordinate magnitude.
        sx, sy, sz = carry

        # pass 1: fold the distance to the previous point into the
        # running min-distance, tracking the global max per batch row.
        def p1(c, m_run):
            sl = pl.ds(c * cs, cs)
            dx = xyz_ref[0, :, sl] - sx
            dy = xyz_ref[1, :, sl] - sy
            dz = xyz_ref[2, :, sl] - sz
            d = dx * dx + dy * dy + dz * dz
            prev = mind_ref[:, sl]
            mc = jnp.where(j > 0, jnp.minimum(prev, d), prev)
            mind_ref[:, sl] = mc
            return jnp.maximum(m_run, jnp.max(mc, axis=1, keepdims=True))

        m = jax.lax.fori_loop(
            0, nchunks, p1, jnp.full((b, 1), -jnp.inf, jnp.float32)
        )

        # pass 2: lowest index attaining the max + its coordinates.
        def p2(c, carry2):
            sel_run, nx, ny, nz = carry2
            sl = pl.ds(c * cs, cs)
            mc = mind_ref[:, sl]
            ic = iota_c + c * cs
            cand = jnp.where(mc == m, ic, _IDX_BIG)
            sel_c = jnp.min(cand, axis=1, keepdims=True)  # [B,1]
            onehot = ic == sel_c
            xx = jnp.sum(jnp.where(onehot, xyz_ref[0, :, sl], 0.0), 1,
                         keepdims=True)
            yy = jnp.sum(jnp.where(onehot, xyz_ref[1, :, sl], 0.0), 1,
                         keepdims=True)
            zz = jnp.sum(jnp.where(onehot, xyz_ref[2, :, sl], 0.0), 1,
                         keepdims=True)
            take = sel_c < sel_run
            return (
                jnp.minimum(sel_run, sel_c),
                jnp.where(take, xx, nx),
                jnp.where(take, yy, ny),
                jnp.where(take, zz, nz),
            )

        sel, nx, ny, nz = jax.lax.fori_loop(
            0, nchunks, p2,
            (jnp.full((b, 1), _IDX_BIG, jnp.int32),
             jnp.zeros((b, 1), jnp.float32),
             jnp.zeros((b, 1), jnp.float32),
             jnp.zeros((b, 1), jnp.float32)),
        )
        # One-hot lane write (dynamic single-lane vector stores don't
        # lower on Mosaic; this full-plane select is cheap since k << N).
        out_ref[:] = jnp.where(iota_k == j, sel, out_ref[:])
        if coords_ref is not None:
            # The selected point's coordinates are already extracted for
            # the next step's distance fold — emitting them here makes the
            # centroid gather in sample_and_group free (three [B, k]
            # plane selects per step, negligible next to the [B, N]
            # passes; values are the one-hot-extracted f32 originals, so
            # bitwise equal to gather_points(xyz, idx)).
            sel_j = iota_kf == j
            coords_ref[0] = jnp.where(sel_j, nx, coords_ref[0])
            coords_ref[1] = jnp.where(sel_j, ny, coords_ref[1])
            coords_ref[2] = jnp.where(sel_j, nz, coords_ref[2])
        return nx, ny, nz

    zero = jnp.zeros((b, 1), jnp.float32)  # unused at j=0 (min-fold skipped)
    jax.lax.fori_loop(0, k, body, (zero, zero, zero))


def _round_up(v, m):
    return -(-v // m) * m


# Per-[B, N] f32 plane budget: 5 planes stay resident (x, y, z, init,
# mind) plus bounded [B, cs] chunk temporaries — 20 MB/plane tops out
# around 104 MB of v5e's 128 MB VMEM.
_MAX_PLANE_BYTES = 20 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("k", "emit_coords"))
def furthest_point_sample(xyz, k: int, mask=None, seed_idx=None,
                          emit_coords: bool = False):
    """[B, N, 3] -> [B, k] int32 FPS indices (index-identical to oracle).

    seed_idx ([B] int32, optional) forces the first selection per cloud:
    its init slot gets 2e10 (> the uniform 1e10), so the first argmax
    uniquely picks it — the Morton-consistent pipeline uses this to
    reproduce the reference FPS set on a permuted cloud.

    emit_coords=True additionally returns the selected coordinates
    [B, k, 3] (bitwise equal to gathering xyz at the indices): the kernel
    extracts them each step anyway, so the SA pipeline's centroid gather
    becomes free."""
    # Integer-only outputs: sever the tangent path so pallas_call is
    # never traced by JVP (it has no AD rules).
    xyz = jax.lax.stop_gradient(jnp.asarray(xyz, jnp.float32))
    b, n, _ = xyz.shape

    bp = _round_up(b, 8)
    np_ = _round_up(n, 128)
    if bp * np_ * 4 > _MAX_PLANE_BYTES:
        # Split the batch; each row group still vectorizes fully.
        rows = max(8, _MAX_PLANE_BYTES // (np_ * 4) // 8 * 8)
        if rows >= b:
            rows = max(8, b // 2 // 8 * 8)  # force a real split
        if np_ * 4 * 8 > _MAX_PLANE_BYTES:
            # A single 8-row group exceeds VMEM residency (N > ~650k):
            # XLA fallback (correct, slower).  Streaming N through HBM
            # per step would be bandwidth-bound at ~20 bytes/point/step —
            # implement if such clouds ever matter.
            from pytorch_points_tpu.ops.sampling import _fps_xla

            idx = _fps_xla(xyz, k, mask, seed_idx=seed_idx)
            if emit_coords:
                return idx, jnp.take_along_axis(xyz, idx[..., None], axis=1)
            return idx
        outs = []
        for s in range(0, b, rows):
            outs.append(
                furthest_point_sample(
                    xyz[s : s + rows],
                    k,
                    None if mask is None else mask[s : s + rows],
                    None if seed_idx is None else seed_idx[s : s + rows],
                    emit_coords=emit_coords,
                )
            )
        if emit_coords:
            return (
                jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0),
            )
        return jnp.concatenate(outs, axis=0)

    if mask is None:
        init = jnp.full((b, n), 1e10, jnp.float32)
    else:
        init = jnp.where(mask, jnp.float32(1e10), -jnp.inf)
    if seed_idx is not None:
        init = init.at[jnp.arange(b), jnp.asarray(seed_idx, jnp.int32)].set(
            2e10
        )
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

    # Chunk size: bounded register live-set (~[B, cs] x handful of
    # temporaries); whole plane when it is already small.
    cs = np_
    while bp * cs > 524288 and cs % 256 == 0:
        cs //= 2

    out_shape = jax.ShapeDtypeStruct((bp, k), jnp.int32)
    out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    if emit_coords:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((3, bp, k), jnp.float32)]
        out_specs = [out_specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
    out = pl.pallas_call(
        functools.partial(_fps_kernel, k=k, cs=cs),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bp, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # 5 resident planes + chunk temporaries (v5e VMEM: 128 MB)
            vmem_limit_bytes=min(
                120 * 1024 * 1024,
                max(32, 6 * bp * np_ * 4 // (1 << 20) + 16) * 1024 * 1024,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * bp * np_ * k, bytes_accessed=4 * bp * (3 * np_ + k),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(planes, init)
    if emit_coords:
        idx, coords = out
        return idx[:b], jnp.transpose(coords[:, :b], (1, 2, 0))
    return out[:b]
