"""nndistance / Chamfer distance.

Reference semantics (SURVEY.md §4.1, BASELINE.json:7): for clouds
``p [B,N,3]`` and ``q [B,M,3]`` return per-point *squared* nearest-neighbor
distances in both directions plus the argmin indices; the backward pass
scatters gradients through the saved argmin pairs only (the argmin itself
is treated as locally constant, exactly like the reference CUDA
``NmDistanceGradKernel``).

TPU-native design: the O(N*M) scan is a VPU broadcast diff^2 distance
tile with a streaming argmin (kernels/distance_tiles.py; exact f32 —
matmul-form distances were rejected: Mosaic's f32 dot is bf16x3 with
~2^-16 relative error), pruned ~3x at N>=8192 by the Morton-sorted
bound-pipeline (kernels/nn_sorted.py); the backward is a deterministic
MXU one-hot scatter-add (no atomics — bitwise reproducible, an
improvement over the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pytorch_points_tpu.core.masking import BIG_DISTANCE, poison_points
from pytorch_points_tpu.kernels import dispatch
from pytorch_points_tpu.ops.pairwise import pairwise_sqdist


def _nn_one_direction_xla(p, q):
    """[B,N,3],[B,M,3] -> (dist [B,N], idx [B,N]): NN of each p point in q."""
    d = pairwise_sqdist(p, q)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    # Recompute exactly (matmul-form d can differ at 1e-7 level); gather the
    # argmin point and compute the true squared distance.
    qsel = jnp.take_along_axis(q, idx[..., None], axis=-2)
    diff = p - qsel
    dist = jnp.sum(diff * diff, axis=-1)
    return dist, idx


def _nndistance_forward(p, q, impl):
    if impl == "sorted":
        # Morton-pruned kernel with original-order rows/indices and
        # reference tie-breaks (kernels/nn_sorted.py).
        from pytorch_points_tpu.kernels import nn_sorted

        with jax.named_scope("ppt.nndistance_sorted"):
            return nn_sorted.nndistance_indexed(p, q)
    if impl == "sorted_masked":
        # Same, for poisoned clouds: validity is recovered from the
        # poison coordinate inside the kernel wrapper.
        from pytorch_points_tpu.kernels import nn_sorted

        with jax.named_scope("ppt.nndistance_sorted_masked"):
            return nn_sorted.nndistance_indexed_masked(p, q)
    impl = dispatch.resolve(impl, "chamfer")
    with jax.named_scope("ppt.nndistance"):
        if impl == "pallas":
            from pytorch_points_tpu.kernels import distance_tiles

            dist1, idx1, dist2, idx2 = distance_tiles.nn_both_directions(p, q)
        else:
            dist1, idx1 = _nn_one_direction_xla(p, q)
            dist2, idx2 = _nn_one_direction_xla(q, p)
    return dist1, idx1, dist2, idx2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nndistance(p, q, impl):
    return _nndistance_forward(p, q, impl)


def _nndistance_fwd(p, q, impl):
    out = _nndistance_forward(p, q, impl)
    dist1, idx1, dist2, idx2 = out
    return out, (p, q, idx1, idx2)


def _row_gather(features, idx):
    """Row gather routed through the MXU one-hot kernel when it wins
    (narrow C, many rows — XLA's gather is ~7 ns/row latency-bound)."""
    from pytorch_points_tpu.ops.sampling import _maybe_pallas_gather

    out = _maybe_pallas_gather(features, idx)
    if out is not None:
        return out
    return jnp.take_along_axis(features, idx[..., None], axis=-2)


def _nndistance_bwd(impl, res, g):
    del impl
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    p, q, idx1, idx2 = res
    g1, _, g2, _ = g
    # Direction 1: dist1[i] = |p[i] - q[idx1[i]]|^2
    diff1 = p - _row_gather(q, idx1)  # [B,N,3]
    gp = 2.0 * g1[..., None] * diff1
    gq = scatter_add_auto(idx1, -gp, q.shape[1])
    # Direction 2: dist2[j] = |q[j] - p[idx2[j]]|^2
    diff2 = q - _row_gather(p, idx2)  # [B,M,3]
    gq = gq + 2.0 * g2[..., None] * diff2
    gp_scatter = scatter_add_auto(idx2, -2.0 * g2[..., None] * diff2,
                                  p.shape[1])
    return gp + gp_scatter, gq


_nndistance.defvjp(_nndistance_fwd, _nndistance_bwd)


def nndistance(p, q, p_mask=None, q_mask=None, impl: str = "auto"):
    """Bidirectional nearest-neighbor squared distances.

    Args:
      p: [B, N, 3] cloud.
      q: [B, M, 3] cloud.
      p_mask / q_mask: optional [B, N] / [B, M] bool validity masks
        (True = real point).  Invalid points never win an argmin; their
        output distances are 0 and their indices 0.
      impl: "auto" | "pallas" | "xla".

    Returns:
      (dist1 [B,N], idx1 [B,N] int32, dist2 [B,M], idx2 [B,M] int32).
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if p.ndim != 3 or q.ndim != 3:
        raise ValueError(f"expected [B,N,C] clouds, got {p.shape} and {q.shape}")
    if p_mask is None and q_mask is None:
        if _use_sorted_path(p, q, None, None, impl):
            # Index/per-point consumers get the ~2x Morton-pruned kernel
            # too: original-order outputs, reference tie-breaks.
            return _nndistance(p, q, "sorted")
        return _nndistance(p, q, impl)
    pp = poison_points(p, p_mask, sign=1.0)
    qp = poison_points(q, q_mask, sign=-1.0)  # opposite side: mutually far
    if _sorted_size_ok(p, q, impl):
        # Masked clouds get the Morton-pruned kernel too (round-2
        # verdict item 1): poison-aware sort + dynamic band windows.
        dist1, idx1, dist2, idx2 = _nndistance(pp, qp, "sorted_masked")
    else:
        dist1, idx1, dist2, idx2 = _nndistance(pp, qp, impl)
    if p_mask is not None:
        dist1 = jnp.where(p_mask, dist1, 0.0)
        idx1 = jnp.where(p_mask, idx1, 0)
    if q_mask is not None:
        dist2 = jnp.where(q_mask, dist2, 0.0)
        idx2 = jnp.where(q_mask, idx2, 0)
    # Clamp any residual poison distance (a valid point whose NN search saw
    # only poisoned candidates cannot happen when masks are non-empty, but
    # keep the output finite regardless).
    dist1 = jnp.minimum(dist1, BIG_DISTANCE)
    dist2 = jnp.minimum(dist2, BIG_DISTANCE)
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# Morton-sorted fast path (kernels/nn_sorted.py)
#
# One shared dispatch for loss, per-point and index consumers: nndistance
# routes to the bound-pruned indexed kernel at N >= _SORTED_MIN_POINTS —
# original-order outputs, reference tie-breaks, custom_vjp backward
# through the saved indices (2 MXU gathers + 2 scatters).  The earlier
# loss-only sorted path (gradients un-permuted with 2 extra scatters)
# measured the same 32.7 ms fwd+bwd at B=32 N=16k and was removed.
# ---------------------------------------------------------------------------

_SORTED_MIN_POINTS = 8192  # per-cloud size where the sorted path wins


def _sorted_size_ok(p, q, impl):
    return (
        p.ndim == 3
        and p.shape[1] >= _SORTED_MIN_POINTS
        and q.shape[1] >= _SORTED_MIN_POINTS
        and dispatch.resolve(impl, "chamfer") == "pallas"
    )


def _use_sorted_path(p, q, p_mask, q_mask, impl):
    return p_mask is None and q_mask is None and _sorted_size_ok(p, q, impl)


def chamfer_path(p, q, p_mask=None, q_mask=None, impl: str = "auto",
                 reduction: str = "none") -> str:
    """Telemetry: which kernel serves a chamfer/nndistance call with these
    arguments — "sorted_loss" (Morton-pruned, no tie payload / un-permute:
    the mean/sum chamfer_distance path), "sorted" (Morton-pruned indexed),
    "sorted_masked", "dense-pallas" or "xla".  Silent perf cliffs (e.g. a
    shape dropping below the sorted threshold) become visible in bench
    output via this marker; the runtime budget-overflow fallback inside
    the sorted kernels logs itself via jax.debug.print
    (kernels/nn_sorted.py)."""
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if dispatch.resolve(impl, "chamfer") != "pallas":
        return "xla"
    if not _sorted_size_ok(p, q, impl):
        return "dense-pallas"
    if p_mask is None and q_mask is None:
        if reduction in ("mean", "sum"):
            return "sorted_loss"
        return "sorted"
    return "sorted_masked"


# ---------------------------------------------------------------------------
# Loss-only sorted chamfer (mean/sum reductions, unmasked)
#
# When only the summed distances are consumed, the indexed kernel's row
# un-permute (two [B, N, 2] parts=3 permutation scatters) is pure
# overhead: sums are permutation-invariant.  The resident kernel keeps
# its tie_orig=True payload — it emits ORIGINAL-space argmin indices
# directly (reference tie-breaks, so gradients route exactly like the
# indexed path even on exact ties) — and the backward scatters straight
# at them, folding each direction's direct + cross term into ONE
# concatenated [B, N+M] scatter (kernels/nn_sorted.py::nndistance_sums).
# Measured -1.69 ms fwd / -0.55 ms fwd+bwd at B=32 N=16k
# (bench/probe_r4_lossonly_h.py); the tie_orig=False variant (no id
# payload, backward re-composes indices with take_along_axis gathers)
# measured +0.39 ms NET and is in the negative ledger (BASELINE.md).
# The indexed path remains the correctness oracle: the loss may differ
# in f32 sum order (measured 0.0 at bench scale), grads to ~4e-12
# (tests/test_chamfer_lossonly.py pins the tolerance).
# ---------------------------------------------------------------------------


def _chamfer_sums_fwd(p, q):
    from pytorch_points_tpu.kernels import nn_sorted

    s1, s2, i1o, i2o, rows_p, rows_q, tgt_p, tgt_q = (
        nn_sorted.nndistance_sums(p, q)
    )
    return (s1, s2), (p, q, i1o, i2o, rows_p, rows_q, tgt_p, tgt_q)


@jax.custom_vjp
def _chamfer_sums_sorted(p, q):
    """Per-cloud summed bidirectional NN distances (s1 [B], s2 [B])."""
    return _chamfer_sums_fwd(p, q)[0]


def _chamfer_sums_bwd(res, g):
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    p, q, i1o, i2o, rows_p, rows_q, tgt_p, tgt_q = res
    g1, g2 = g
    # rows in sorted space, NN partner gathered from the ORIGINAL cloud
    # (the kernel's indices are original-space).
    diff1 = rows_p - _row_gather(q, i1o)  # [B,N,3]
    diff2 = rows_q - _row_gather(p, i2o)  # [B,M,3]
    u1 = 2.0 * g1[:, None, None] * diff1
    u2 = 2.0 * g2[:, None, None] * diff2
    n, m = p.shape[1], q.shape[1]
    # direct term un-permutes via its sort-target rows, cross term lands
    # at the kernel's original-space indices: one scatter per cloud.
    gp = scatter_add_auto(jnp.concatenate([tgt_p, i2o], 1),
                          jnp.concatenate([u1, -u2], 1), n)
    gq = scatter_add_auto(jnp.concatenate([tgt_q, i1o], 1),
                          jnp.concatenate([u2, -u1], 1), m)
    return gp, gq


_chamfer_sums_sorted.defvjp(_chamfer_sums_fwd, _chamfer_sums_bwd)


def chamfer_distance(
    p,
    q,
    p_mask=None,
    q_mask=None,
    *,
    reduction: str = "mean",
    one_sided: bool = False,
    impl: str = "auto",
):
    """Chamfer distance between two clouds (squared-distance form).

    ``mean`` averages each direction over the number of *valid* points then
    sums the two directions — matching the reference ChamferLoss
    (SURVEY.md §3.2 P2).

    At large N this dispatches (masked or not) to the Morton-pruned
    indexed kernel (kernels/nn_sorted.py), whose outputs are already in
    input order — every reduction, including ``"none"``, rides the fast
    path.
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if (
        reduction in ("mean", "sum")
        and p_mask is None
        and q_mask is None
        and _use_sorted_path(p, q, None, None, impl)
    ):
        # mean/sum with no index consumer: skip the tie payload and the
        # un-permute scatters entirely (loss-only sorted path above).
        with jax.named_scope("ppt.chamfer_loss_sorted"):
            s1, s2 = _chamfer_sums_sorted(p, q)
        if reduction == "mean":
            l1, l2 = s1 / p.shape[1], s2 / q.shape[1]
        else:
            l1, l2 = s1, s2
        return jnp.mean(l1) if one_sided else jnp.mean(l1 + l2)
    # nndistance dispatches to the Morton-pruned indexed kernel at large N
    # (masked or not) — one shared fast path for loss, per-point and index
    # consumers alike.
    dist1, _, dist2, _ = nndistance(p, q, p_mask, q_mask, impl=impl)

    def _reduce(d, mask):
        if reduction == "none":
            return d
        if mask is None:
            return jnp.mean(d, axis=-1) if reduction == "mean" else jnp.sum(d, -1)
        s = jnp.sum(jnp.where(mask, d, 0.0), axis=-1)
        if reduction == "sum":
            return s
        return s / jnp.maximum(jnp.sum(mask, axis=-1), 1)

    loss1 = _reduce(dist1, p_mask)
    if one_sided:
        return jnp.mean(loss1) if reduction != "none" else loss1
    loss2 = _reduce(dist2, q_mask)
    if reduction == "none":
        return loss1, loss2
    return jnp.mean(loss1 + loss2)
