"""Pallas streaming nearest-neighbor distance kernel (SURVEY.md §3.1 N1).

The shared primitive behind chamfer (and the model for EMD/kNN tiles): for
p [B,N,3], q [B,M,3], compute per-p-point min squared distance over q plus
the argmin index, without ever materializing the [N, M] matrix in HBM.

TPU mapping decisions (why this is not the CUDA design):
  * The reference CUDA kernel gives one thread per p point scanning q in
    shared-memory tiles.  Here a [tM, tN] distance tile is computed on the
    VPU via broadcast differences — q coordinates vary along *sublanes*,
    p coordinates along *lanes* — so the per-direction reduction
    (min over q) is a sublane reduction landing in the natural [1, tN]
    lane layout of the output.
  * The MXU matmul form (|p|^2+|q|^2-2pq) is deliberately NOT used: the
    contraction depth is 3, so the 128-deep systolic array would run at
    ~2% utilization and f32 matmul costs 3 passes.  The VPU broadcast form
    does ~9 flops/element at full vector width.
  * M is streamed as the innermost grid dimension with a running
    (min, argmin) carried in VMEM scratch across grid steps (the standard
    Pallas TPU reduction idiom — Pallas double-buffers the q-chunk DMA).
  * Tie-breaking: within a chunk, equal minima resolve to the lowest index
    (iota + where + min); across chunks, strict ``<`` keeps the earlier
    chunk — together: global lowest-index argmin, matching the XLA path
    and the reference semantics.

Fidelity: distances are exact f32 sums of squared differences — identical
operations to the NumPy oracle, so values match to float rounding and
indices match exactly (BASELINE.json:5 "distances within 1e-5,
index-identical").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.core.masking import BIG_COORD
from pytorch_points_tpu.kernels.dispatch import interpret_mode

_IDX_SENTINEL = 2**30  # plain int: jnp scalars would be captured consts


def _nn_kernel(pt_ref, qs_ref, out_d_ref, out_i_ref, accd, acci, *, tm):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.zeros_like(acci)

    q = qs_ref[0]  # [tM, 8] (coords in cols 0..2, zeros elsewhere)
    p = pt_ref[0]  # [8, tN]
    d = jnp.zeros((q.shape[0], p.shape[1]), jnp.float32)
    for c in range(3):
        diff = q[:, c : c + 1] - p[c : c + 1, :]  # [tM, tN] broadcast
        d = d + diff * diff

    m = jnp.min(d, axis=0, keepdims=True)  # [1, tN]
    ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    cand = jnp.where(d == m, ii, _IDX_SENTINEL)
    a = jnp.min(cand, axis=0, keepdims=True) + j * tm  # [1, tN]

    better = m < accd[:]
    accd[:] = jnp.where(better, m, accd[:])
    acci[:] = jnp.where(better, a, acci[:])

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[0] = accd[:]
        out_i_ref[0] = acci[:]


def _nn_both_kernel(pt_ref, qs_ref, out_d1_ref, out_i1_ref, out_d2_ref,
                    out_i2_ref, accd, acci, d2acc, i2acc, *, tm, tn):
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.zeros_like(acci)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        d2acc[:] = jnp.full_like(d2acc, jnp.inf)
        i2acc[:] = jnp.zeros_like(i2acc)

    q = qs_ref[0]  # [tM, 8]
    p = pt_ref[0]  # [8, tN]
    d = jnp.zeros((tm, tn), jnp.float32)
    for c in range(3):
        diff = q[:, c : c + 1] - p[c : c + 1, :]
        d = d + diff * diff

    # direction 1: for each p point, min over this q chunk (sublane reduce)
    m = jnp.min(d, axis=0, keepdims=True)  # [1, tN]
    ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    a = jnp.min(jnp.where(d == m, ii, _IDX_SENTINEL), axis=0,
                keepdims=True) + j * tm
    better = m < accd[:]
    accd[:] = jnp.where(better, m, accd[:])
    acci[:] = jnp.where(better, a, acci[:])

    # direction 2: for each q point, min over this p chunk (lane reduce);
    # accumulator lives sublane-major as [tM, nJ] (q point j*tM + r at
    # (r, j)) so no transposes are needed.
    m2 = jnp.min(d, axis=1, keepdims=True)  # [tM, 1]
    il = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    a2 = jnp.min(jnp.where(d == m2, il, _IDX_SENTINEL), axis=1,
                 keepdims=True) + i * tn  # [tM, 1]
    lane_nj = jax.lax.broadcasted_iota(jnp.int32, d2acc.shape, 1)
    cond = jnp.logical_and(lane_nj == j, m2 < d2acc[:])
    d2acc[:] = jnp.where(cond, jnp.broadcast_to(m2, d2acc.shape), d2acc[:])
    i2acc[:] = jnp.where(cond, jnp.broadcast_to(a2, i2acc.shape), i2acc[:])

    @pl.when(j == nj - 1)
    def _():
        out_d1_ref[0] = accd[:]
        out_i1_ref[0] = acci[:]

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _():
        out_d2_ref[0] = d2acc[:]
        out_i2_ref[0] = i2acc[:]


def _nn_both_pruned_kernel(cand_ref, pt_ref, qs_ref, out_d1_ref, out_i1_ref,
                           out_d2_ref, out_i2_ref, accd, acci, d2acc, i2acc,
                           *, tm, tn):
    """The fused kernel with a per-(i, j) AABB-pruning skip guard.

    cand[b, i, j] == 0 means no point in p-tile i can have its nearest
    neighbor in q-tile j AND vice versa (sound bound computed by the
    wrapper), so the whole tile pair is skipped — accumulators untouched.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.zeros_like(acci)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        d2acc[:] = jnp.full_like(d2acc, jnp.inf)
        i2acc[:] = jnp.zeros_like(i2acc)

    @pl.when(cand_ref[0, i, j] != 0)
    def _():
        q = qs_ref[0]  # [tM, 8]
        p = pt_ref[0]  # [8, tN]
        d = jnp.zeros((tm, tn), jnp.float32)
        for c in range(3):
            diff = q[:, c : c + 1] - p[c : c + 1, :]
            d = d + diff * diff

        m = jnp.min(d, axis=0, keepdims=True)
        ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        a = jnp.min(jnp.where(d == m, ii, _IDX_SENTINEL), axis=0,
                    keepdims=True) + j * tm
        better = m < accd[:]
        accd[:] = jnp.where(better, m, accd[:])
        acci[:] = jnp.where(better, a, acci[:])

        m2 = jnp.min(d, axis=1, keepdims=True)
        il = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        a2 = jnp.min(jnp.where(d == m2, il, _IDX_SENTINEL), axis=1,
                     keepdims=True) + i * tn
        lane_nj = jax.lax.broadcasted_iota(jnp.int32, d2acc.shape, 1)
        cond = jnp.logical_and(lane_nj == j, m2 < d2acc[:])
        d2acc[:] = jnp.where(cond, jnp.broadcast_to(m2, d2acc.shape),
                             d2acc[:])
        i2acc[:] = jnp.where(cond, jnp.broadcast_to(a2, i2acc.shape),
                             i2acc[:])

    @pl.when(j == nj - 1)
    def _():
        out_d1_ref[0] = accd[:]
        out_i1_ref[0] = acci[:]

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _():
        out_d2_ref[0] = d2acc[:]
        out_i2_ref[0] = i2acc[:]


def _nn_worklist_kernel(iidx_ref, jidx_ref, init1_ref, emit1_ref, skip_ref,
                        pt_ref, qs_ref, out_d1_ref, out_i1_ref, out_d2_ref,
                        out_i2_ref, accd, acci, d2acc, i2acc, *, tm, tn):
    """Candidate-pair worklist form of the pruned kernel.

    The grid is (B, K) over a compacted, i-major-sorted list of candidate
    tile pairs (scalar-prefetched so the block index maps DMA the right
    tiles); pruned pairs never become grid steps at all.  Flags mark the
    first/last occurrence of each p-tile (accumulator init / emit) and
    padding entries (skip).
    """
    b = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(init1_ref[b, k] != 0)
    def _():
        accd[:] = jnp.full_like(accd, jnp.inf)
        acci[:] = jnp.zeros_like(acci)

    @pl.when(k == 0)
    def _():
        d2acc[:] = jnp.full_like(d2acc, jnp.inf)
        i2acc[:] = jnp.zeros_like(i2acc)

    @pl.when(skip_ref[b, k] == 0)
    def _():
        i = iidx_ref[b, k]
        j = jidx_ref[b, k]
        q = qs_ref[0]  # [tM, 8]
        p = pt_ref[0]  # [8, tN]
        d = jnp.zeros((tm, tn), jnp.float32)
        for c in range(3):
            diff = q[:, c : c + 1] - p[c : c + 1, :]
            d = d + diff * diff

        m = jnp.min(d, axis=0, keepdims=True)
        ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        a = jnp.min(jnp.where(d == m, ii, _IDX_SENTINEL), axis=0,
                    keepdims=True) + j * tm
        better = m < accd[:]
        accd[:] = jnp.where(better, m, accd[:])
        acci[:] = jnp.where(better, a, acci[:])

        m2 = jnp.min(d, axis=1, keepdims=True)
        il = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        a2 = jnp.min(jnp.where(d == m2, il, _IDX_SENTINEL), axis=1,
                     keepdims=True) + i * tn
        lane_nj = jax.lax.broadcasted_iota(jnp.int32, d2acc.shape, 1)
        cond = jnp.logical_and(lane_nj == j, m2 < d2acc[:])
        d2acc[:] = jnp.where(cond, jnp.broadcast_to(m2, d2acc.shape),
                             d2acc[:])
        i2acc[:] = jnp.where(cond, jnp.broadcast_to(a2, i2acc.shape),
                             i2acc[:])

    @pl.when(emit1_ref[b, k] != 0)
    def _():
        out_d1_ref[0] = accd[:]
        out_i1_ref[0] = acci[:]

    @pl.when(k == nk - 1)
    def _():
        out_d2_ref[0] = d2acc[:]
        out_i2_ref[0] = i2acc[:]


def _morton_codes(xyz, bits: int = 10):
    """[B, N, 3] -> [B, N] uint32 Morton codes over each cloud's AABB."""
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    t = (xyz - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((t * (2**bits - 1)).astype(jnp.uint32), 0, 2**bits - 1)

    def spread(v):  # spread 10 bits to every 3rd bit
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        spread(q[..., 0])
        | (spread(q[..., 1]) << 1)
        | (spread(q[..., 2]) << 2)
    )


def _tile_bounds(x, tile):
    """sorted [B, N', 3] -> (lo [B, nT, 3], hi [B, nT, 3]) per tile."""
    b, n, _ = x.shape
    xr = x.reshape(b, n // tile, tile, 3)
    return jnp.min(xr, axis=2), jnp.max(xr, axis=2)


def _round_up(x, m):
    return -(-x // m) * m


def _pad_points_poison(x, target_n):
    """Pad [B,N,C] to [B,target_n,C] with far-away, mutually-distant coords."""
    b, n, c = x.shape
    if n == target_n:
        return x
    pad = target_n - n
    offs = BIG_COORD * 4.0 + 8.0 * jnp.arange(pad, dtype=x.dtype)
    poison = jnp.zeros((b, pad, c), x.dtype).at[:, :, 0].set(offs[None, :])
    return jnp.concatenate([x, poison], axis=1)


@functools.partial(jax.jit, static_argnames=("tn", "tm"))
def nn_one_direction(p, q, tn: int | None = None, tm: int | None = None):
    """For each p point, (min squared distance over q, argmin index).

    Args:
      p: [B, N, 3] query cloud.
      q: [B, M, 3] support cloud.
      tn/tm: tile sizes (lanes over p / sublanes over q); auto-chosen.

    Returns:
      (dist [B, N] f32, idx [B, N] int32).
    """
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    b, n, _ = p.shape
    m = q.shape[1]

    if tn is None:
        tn = min(1024, _round_up(n, 128))
    if tm is None:
        tm = min(512, _round_up(m, 8))

    n_pad = _round_up(n, tn)
    m_pad = _round_up(m, tm)
    # Padded p rows produce garbage outputs (sliced off); padded q points
    # are poisoned so they never win an argmin.
    pp = jnp.pad(p, ((0, 0), (0, n_pad - n), (0, 0)))
    qp = _pad_points_poison(q, m_pad)

    # p coord-major [B, 8, N'] (lane-broadcast side), q point-major
    # [B, M', 8] (sublane-broadcast side); coord dim padded 3 -> 8 so the
    # sublane dimension is aligned.
    pt = jnp.transpose(
        jnp.pad(pp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1)
    )  # [B, 8, N']
    qs = jnp.pad(qp, ((0, 0), (0, 0), (0, 5)))  # [B, M', 8]

    grid = (b, n_pad // tn, m_pad // tm)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nn_kernel, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # [B, 1, N'] so the trailing two block dims satisfy TPU layout
            # rules (sublane dim equals the full array dim of 1).
            pl.BlockSpec((1, 1, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tn), jnp.float32),
            pltpu.VMEM((1, tn), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * n_pad * m_pad,
            bytes_accessed=4 * b * (8 * n_pad + 8 * m_pad + 2 * n_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(pt, qs)
    return out_d[:, 0, :n], out_i[:, 0, :n]


@functools.partial(jax.jit, static_argnames=("tn", "tm"))
def nn_both_directions(p, q, tn: int | None = None, tm: int | None = None):
    """Fused bidirectional NN: each [tM, tN] distance tile is computed once
    and reduced along both axes (~35% cheaper than two one-direction
    passes).

    Returns (dist1 [B,N], idx1, dist2 [B,M], idx2) — same contract as the
    reference nmdistance (SURVEY.md §4.1).
    """
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    b, n, _ = p.shape
    m = q.shape[1]

    if tn is None:
        tn = min(1024, _round_up(n, 128))
    if tm is None:
        # tm=256 is ~10% faster at large M (smaller tiles pipeline better)
        # but its Mosaic compile is minutes; use it only where it pays and
        # rely on the persistent compile cache.
        tm = min(256 if m >= 8192 else 512, _round_up(m, 8))

    n_pad = _round_up(n, tn)
    m_pad = _round_up(m, tm)
    nj = m_pad // tm
    # Both sides are support for the other: poison both paddings, on
    # opposite signs so pads never become a real point's neighbor.
    pp = _pad_points_poison(p, n_pad)
    qp = _pad_points_poison_neg(q, m_pad)

    pt = jnp.transpose(jnp.pad(pp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    qs = jnp.pad(qp, ((0, 0), (0, 0), (0, 5)))

    grid = (b, n_pad // tn, nj)
    out_d1, out_i1, out_d2, out_i2 = pl.pallas_call(
        functools.partial(_nn_both_kernel, tm=tm, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, nj), lambda bi, i, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, nj), lambda bi, i, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, tm, nj), jnp.float32),
            jax.ShapeDtypeStruct((b, tm, nj), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tn), jnp.float32),
            pltpu.VMEM((1, tn), jnp.int32),
            pltpu.VMEM((tm, nj), jnp.float32),
            pltpu.VMEM((tm, nj), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * b * n_pad * m_pad,
            bytes_accessed=4 * b * (8 * n_pad + 8 * m_pad + 2 * n_pad
                                    + 2 * m_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(pt, qs)
    d1 = out_d1[:, 0, :n]
    i1 = out_i1[:, 0, :n]
    # [B, tM, nJ] with q point j*tM + r at (r, j) -> [B, M']
    d2 = jnp.transpose(out_d2, (0, 2, 1)).reshape(b, m_pad)[:, :m]
    i2 = jnp.transpose(out_i2, (0, 2, 1)).reshape(b, m_pad)[:, :m]
    return d1, i1, d2, i2


def _pad_points_poison_neg(x, target_n):
    b, n, c = x.shape
    if n == target_n:
        return x
    pad = target_n - n
    offs = -(BIG_COORD * 4.0 + 8.0 * jnp.arange(pad, dtype=x.dtype))
    poison = jnp.zeros((b, pad, c), x.dtype).at[:, :, 0].set(offs[None, :])
    return jnp.concatenate([x, poison], axis=1)


def _run_worklist(cand, pt, qs, b, ni, nj, tn, tm, n_pad, k_max):
    """Compact candidate pairs into an i-major worklist and run the
    PrefetchScalarGridSpec kernel over exactly those pairs."""
    flat = cand.reshape(b, ni * nj)
    # stable sort, candidates first -> i-major order preserved
    order = jnp.argsort(1 - flat, axis=1, stable=True)[:, :k_max]
    count = jnp.sum(flat, axis=1)  # [B]
    karange = jnp.arange(k_max)[None, :]
    real = karange < count[:, None]
    iidx = jnp.where(real, (order // nj).astype(jnp.int32), ni - 1)
    jidx = jnp.where(real, (order % nj).astype(jnp.int32), 0)
    prev_i = jnp.concatenate([iidx[:, :1] - 1, iidx[:, :-1]], axis=1)
    init1 = (iidx != prev_i).astype(jnp.int32)
    nxt_i = jnp.concatenate([iidx[:, 1:], iidx[:, -1:] + 1], axis=1)
    emit1 = (iidx != nxt_i).astype(jnp.int32)
    skip = (~real).astype(jnp.int32)
    # padding entries alias i = ni-1: suppress their init/emit except that
    # the transition INTO padding already emitted the real last tile above.
    init1 = jnp.where(real, init1, 0)
    emit1 = jnp.where(real, emit1, 0)
    # the final real entry must emit even if followed by padding aliasing
    # the same i: nxt_i at the boundary is a padding i (ni-1)...
    last_real = karange == (count - 1)[:, None]
    emit1 = jnp.where(last_real, 1, emit1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, k_max),
        in_specs=[
            pl.BlockSpec((1, 8, tn),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, 0, ii[bb, kk]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, jj[bb, kk], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, 0, ii[bb, kk]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, 0, ii[bb, kk]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, nj),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, nj),
                         lambda bb, kk, ii, jj, i1, e1, sk: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tn), jnp.float32),
            pltpu.VMEM((1, tn), jnp.int32),
            pltpu.VMEM((tm, nj), jnp.float32),
            pltpu.VMEM((tm, nj), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_nn_worklist_kernel, tm=tm, tn=tn),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, tm, nj), jnp.float32),
            jax.ShapeDtypeStruct((b, tm, nj), jnp.int32),
        ],
        interpret=interpret_mode(),
    )(iidx, jidx, init1, emit1, skip, pt, qs), count


@functools.partial(jax.jit, static_argnames=("tn", "tm"))
def nn_both_directions_pruned(p, q, tn: int | None = None,
                              tm: int | None = None):
    """Fused bidirectional NN with Morton-sorted AABB tile pruning.

    Both clouds are sorted along a Morton curve so tiles become spatially
    coherent; per-tile AABBs then give a sound lower bound (min possible
    distance) and upper bound (some tile whose max possible distance
    bounds every point's NN) — tile pairs whose lower bound exceeds the
    upper bound in BOTH directions are skipped entirely inside the kernel.
    With the rank-aligned upper bound ~77% of tile pairs are pruned on
    uniform clouds (91% on surface data).

    STATUS — experimental, not dispatched by default: results are exact
    (verified equal to the dense kernel on hardware, B=32 N=16k), and the
    candidate list (23% of pairs) is driven through a
    PrefetchScalarGridSpec worklist so pruned pairs never become grid
    steps — but it still measures 107 ms vs 60 ms dense: the dynamic
    block-index DMAs pipeline poorly and the Morton permute/un-permute
    adds ~6 narrow-row gathers.  Remaining work (ROADMAP.md): route the
    permutation gathers through kernels/gather.py and investigate Mosaic
    multi-buffering with prefetched indices.  Argmin TIES may resolve to
    a different equal-distance index than the unsorted scan (sort order
    replaces the lowest-index rule) — within the fidelity bar
    (BASELINE.json:5 requires exact distances; index identity is required
    of FPS).
    """
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    b, n, _ = p.shape
    m = q.shape[1]

    if tn is None:
        tn = min(1024, _round_up(n, 128))
    if tm is None:
        tm = min(256 if m >= 8192 else 512, _round_up(m, 8))
    n_pad = _round_up(n, tn)
    m_pad = _round_up(m, tm)
    ni, nj = n_pad // tn, m_pad // tm

    perm_p = jnp.argsort(_morton_codes(p), axis=1).astype(jnp.int32)
    perm_q = jnp.argsort(_morton_codes(q), axis=1).astype(jnp.int32)
    ps = jnp.take_along_axis(p, perm_p[..., None], axis=1)
    qs_sorted = jnp.take_along_axis(q, perm_q[..., None], axis=1)

    pp = _pad_points_poison(ps, n_pad)
    qp = _pad_points_poison_neg(qs_sorted, m_pad)

    plo, phi = _tile_bounds(pp, tn)  # [B, nI, 3]
    qlo, qhi = _tile_bounds(qp, tm)  # [B, nJ, 3]
    gap = jnp.maximum(
        jnp.maximum(qlo[:, None, :, :] - phi[:, :, None, :],
                    plo[:, :, None, :] - qhi[:, None, :, :]),
        0.0,
    )
    lb = jnp.sum(gap * gap, axis=-1)  # [B, nI, nJ] sound lower bound
    # Rank-aligned upper bound: after Morton sorting, the q point at the
    # same (scaled) rank is spatially close, and every point's NN distance
    # is <= its distance to that specific point — a far tighter per-tile
    # bound than AABB max-distance (measured: 0.16 vs 1.00 candidate
    # fraction on uniform clouds at these tile sizes).
    jal = jnp.arange(n) * m // n
    d_al1 = jnp.sum((ps - qs_sorted[:, jal, :]) ** 2, axis=-1)  # [B, N]
    d_al1 = jnp.pad(d_al1, ((0, 0), (0, n_pad - n)),
                    constant_values=jnp.inf)  # pad tiles keep everything
    ub1 = jnp.max(d_al1.reshape(b, ni, tn), axis=-1)  # [B, nI]
    ial = jnp.arange(m) * n // m
    d_al2 = jnp.sum((qs_sorted - ps[:, ial, :]) ** 2, axis=-1)
    d_al2 = jnp.pad(d_al2, ((0, 0), (0, m_pad - m)),
                    constant_values=jnp.inf)
    ub2 = jnp.max(d_al2.reshape(b, nj, tm), axis=-1)  # [B, nJ]
    safe = 1.0 + 1e-5
    cand = jnp.logical_or(
        lb <= ub1[:, :, None] * safe, lb <= ub2[:, None, :] * safe
    ).astype(jnp.int32)

    pt = jnp.transpose(jnp.pad(pp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    qs = jnp.pad(qp, ((0, 0), (0, 0), (0, 5)))

    # Static worklist budget; the dense fused kernel handles the (rare)
    # overflow case so pruning is always sound.
    k_max = max(ni, min(ni * nj, int(0.45 * ni * nj) + ni))
    work_outs, count = _run_worklist(
        cand, pt, qs, b, ni, nj, tn, tm, n_pad, k_max
    )
    overflow = jnp.any(count > k_max)

    def dense(_):
        return tuple(nn_both_directions(p, q, tn=tn, tm=tm))

    def from_work(_):
        wd1, wi1, wd2, wi2 = work_outs
        inv_p_ = jnp.argsort(perm_p, axis=1)
        inv_q_ = jnp.argsort(perm_q, axis=1)
        d1s_ = wd1[:, 0, :n]
        i1s_ = wi1[:, 0, :n]
        d2s_ = jnp.transpose(wd2, (0, 2, 1)).reshape(b, m_pad)[:, :m]
        i2s_ = jnp.transpose(wi2, (0, 2, 1)).reshape(b, m_pad)[:, :m]
        i1_ = jnp.take_along_axis(
            jnp.take_along_axis(perm_q, i1s_, axis=1), inv_p_, axis=1
        )
        d1_ = jnp.take_along_axis(d1s_, inv_p_, axis=1)
        i2_ = jnp.take_along_axis(
            jnp.take_along_axis(perm_p, i2s_, axis=1), inv_q_, axis=1
        )
        d2_ = jnp.take_along_axis(d2s_, inv_q_, axis=1)
        return d1_, i1_, d2_, i2_

    return jax.lax.cond(overflow, dense, from_work, None)
