"""Loss callables mirroring the reference's ``model_loss.py`` classes.

Each loss is a stateless dataclass-style callable (configuration in the
constructor, pure function in ``__call__``) so instances are hashable
jit-statics and trivially usable inside flax/nnx modules — the TPU
equivalent of the reference's ``nn.Module`` losses.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pytorch_points_tpu import geo
from pytorch_points_tpu.ops import (
    earth_mover_distance,
    knn,
    nndistance,
)


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


@dataclasses.dataclass(frozen=True)
class ChamferLoss:
    """Bidirectional Chamfer loss with optional trimming.

    ``percentage < 1`` keeps only that fraction of smallest per-point
    distances in each direction (outlier-robust chamfer, as in the
    reference's filtered ChamferLoss).
    """

    threshold: float | None = None
    percentage: float = 1.0
    one_sided: bool = False
    reduction: str = "mean"

    def __call__(self, pred, gt, pred_mask=None, gt_mask=None):
        d1, _, d2, _ = nndistance(pred, gt, pred_mask, gt_mask)

        def direction(d, mask):
            if self.threshold is not None:
                d = jnp.where(d < self.threshold, d, 0.0)
            if self.percentage < 1.0:
                n = d.shape[-1]
                if mask is not None:
                    # keep-fraction of the *valid* count (padding must not
                    # inflate the kept set); masked points sort to the end.
                    d = jnp.where(mask, d, jnp.inf)
                    valid = jnp.sum(mask, -1)
                    keep_dyn = jnp.maximum(
                        (valid * self.percentage).astype(jnp.int32), 1
                    )
                    d_sorted = jnp.sort(d, axis=-1)
                    pos = jnp.arange(n)
                    sel = pos < keep_dyn[..., None]
                    d_kept = jnp.where(sel, jnp.where(jnp.isinf(d_sorted), 0.0, d_sorted), 0.0)
                    return jnp.sum(d_kept, -1) / keep_dyn
                keep = max(1, int(n * self.percentage))
                d = jnp.sort(d, axis=-1)[..., :keep]  # smallest `keep`
                return jnp.mean(d, axis=-1)
            if mask is not None:
                d = jnp.where(mask, d, 0.0)
                return jnp.sum(d, -1) / jnp.maximum(jnp.sum(mask, -1), 1)
            return jnp.mean(d, axis=-1)

        loss = direction(d1, pred_mask)
        if not self.one_sided:
            loss = loss + direction(d2, gt_mask)
        return _reduce(loss, self.reduction)


@dataclasses.dataclass(frozen=True)
class EMDLoss:
    """Auction-EMD loss (mean matched squared distance).

    Training operating point: ``endgame_pop_cap`` defaults to 384 here
    (vs 768 on the raw op / metrics).  On the correlated pairs a train
    step feeds the loss, 384 is already +0.1-0.2% of the Hungarian
    optimum and ~20% faster per step; the op's 768 default buys
    assignment fidelity that only matters when EMD is the *measurement*
    (bench/probe_r4_emdq2.py + BASELINE.md ledger).

    MEASURED WORST CASE of this default (round-4 sweep, 8-element
    Hungarian oracle): on UNCORRELATED standard-normal cloud pairs —
    unlike anything a converging model emits, but exactly what e.g. a
    randomly-initialized generator's first steps look like — pop cap 384
    measured **+3.2% mean / +5.03% max** over the optimum, i.e. the max
    can exceed the library's 5% near-optimality bar.  If your training
    pairs are near-random (or you use this class as a *metric*), pass
    ``endgame_pop_cap=768``, which measured +1.35% / +2.05% on the same
    clouds (bench/probe_r4_emdq3.py; PARITY.md semantics table).
    """

    eps: float = 0.005
    max_iters: int = 15
    phases: int = 3
    endgame_pop_cap: int = 384
    reduction: str = "mean"

    def __call__(self, pred, gt, pred_mask=None, gt_mask=None):
        dist, _ = earth_mover_distance(
            pred, gt, eps=self.eps, max_iters=self.max_iters,
            phases=self.phases, endgame_pop_cap=self.endgame_pop_cap,
            p_mask=pred_mask, q_mask=gt_mask,
        )
        if pred_mask is None:
            per = jnp.mean(dist, axis=-1)
        else:
            # masked slots carry dist 0; mean over the VALID count
            per = jnp.sum(dist, axis=-1) / jnp.maximum(
                jnp.sum(pred_mask, axis=-1), 1
            )
        return _reduce(per, self.reduction)


@dataclasses.dataclass(frozen=True)
class SmapeLoss:
    """Symmetric mean absolute percentage error |x-y| / (|x|+|y|+eps)."""

    eps: float = 1e-8
    reduction: str = "mean"

    def __call__(self, pred, gt):
        e = jnp.abs(pred - gt) / (jnp.abs(pred) + jnp.abs(gt) + self.eps)
        return _reduce(e, self.reduction)


@dataclasses.dataclass(frozen=True)
class PointLaplacianLoss:
    """Compare graph-Laplacian coordinates of two clouds under the
    *reference cloud's* kNN neighborhoods (detail-preservation loss)."""

    k: int = 8
    metric: str = "l2"  # l2 | l1
    use_norm: bool = False  # compare magnitudes only
    reduction: str = "mean"

    def __call__(self, gt, pred, gt_mask=None):
        lap_gt, idx = geo.point_laplacian(gt, self.k, mask=gt_mask)
        lap_pred, _ = geo.point_laplacian(pred, self.k, idx=idx)
        if self.use_norm:
            a = jnp.linalg.norm(lap_gt, axis=-1)
            b = jnp.linalg.norm(lap_pred, axis=-1)
        else:
            a, b = lap_gt, lap_pred
        diff = jnp.abs(a - b) if self.metric == "l1" else (a - b) ** 2
        if gt_mask is not None:
            diff = jnp.where(
                gt_mask[..., None] if diff.ndim == 3 else gt_mask, diff, 0.0
            )
        return _reduce(diff, self.reduction)


@dataclasses.dataclass(frozen=True)
class MeshLaplacianLoss:
    """Laplacian comparison (or magnitude) on meshes with shared topology.

    With ``compare=True`` penalizes Laplacian change between two vertex
    sets; otherwise penalizes the Laplacian magnitude (smoothing)."""

    uniform: bool = True
    compare: bool = True
    reduction: str = "mean"

    def __call__(self, verts, faces_or_edges, verts_ref=None):
        if self.uniform:
            lap = geo.uniform_laplacian(verts, faces_or_edges)
            lap_ref = (
                geo.uniform_laplacian(verts_ref, faces_or_edges)
                if (self.compare and verts_ref is not None)
                else None
            )
        else:
            lap = geo.cot_laplacian(verts, faces_or_edges)
            lap_ref = (
                geo.cot_laplacian(verts_ref, faces_or_edges)
                if (self.compare and verts_ref is not None)
                else None
            )
        if lap_ref is not None:
            return _reduce((lap - lap_ref) ** 2, self.reduction)
        return _reduce(lap**2, self.reduction)


@dataclasses.dataclass(frozen=True)
class NormalLoss:
    """1 - |cos| between normals of matched (nearest) points."""

    reduction: str = "mean"

    def __call__(self, pred, pred_normals, gt, gt_normals):
        _, idx, _, _ = nndistance(pred, gt)
        matched = jnp.take_along_axis(gt_normals, idx[..., None], axis=1)
        cos = jnp.sum(pred_normals * matched, axis=-1)
        denom = jnp.maximum(
            jnp.linalg.norm(pred_normals, axis=-1)
            * jnp.linalg.norm(matched, axis=-1),
            1e-12,
        )
        return _reduce(1.0 - jnp.abs(cos / denom), self.reduction)


@dataclasses.dataclass(frozen=True)
class PointEdgeLengthLoss:
    """Penalize kNN-edge length change between two clouds under the first
    cloud's neighborhoods."""

    k: int = 8
    metric: str = "l2"
    reduction: str = "mean"

    def __call__(self, gt, pred):
        from pytorch_points_tpu.ops.grouping import group_points

        _, idx = knn(gt, gt, self.k + 1)
        idx = idx[..., 1:]
        d_gt = jnp.linalg.norm(
            group_points(gt, idx) - gt[:, :, None, :], axis=-1
        )
        d_pred = jnp.linalg.norm(
            group_points(pred, idx) - pred[:, :, None, :], axis=-1
        )
        diff = (
            jnp.abs(d_gt - d_pred)
            if self.metric == "l1"
            else (d_gt - d_pred) ** 2
        )
        return _reduce(diff, self.reduction)


@dataclasses.dataclass(frozen=True)
class MeshEdgeLengthLoss:
    """Penalize mesh edge-length deviation (vs reference verts or mean)."""

    reduction: str = "mean"

    def __call__(self, verts, edges, verts_ref=None):
        el = geo.edge_lengths(verts, edges)
        if verts_ref is not None:
            target = geo.edge_lengths(verts_ref, edges)
            return _reduce((el - target) ** 2, self.reduction)
        return _reduce((el - jnp.mean(el, axis=-1, keepdims=True)) ** 2,
                       self.reduction)


@dataclasses.dataclass(frozen=True)
class RepulsionLoss:
    """3PU-style repulsion: push kNN neighbors apart below radius h.

    loss = mean_i mean_j eta(d_ij) * w(d_ij), eta(d) = -d,
    w(d) = exp(-d^2 / h^2) — minimized when neighbors spread out.
    """

    k: int = 4
    h: float = 0.03
    reduction: str = "mean"

    def __call__(self, xyz, mask=None):
        dist2, idx = knn(xyz, xyz, self.k + 1, support_mask=mask)
        dist2 = dist2[..., 1:]  # drop self
        d = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        w = jnp.exp(-dist2 / (self.h**2))
        loss = -d * w
        if mask is not None:
            loss = jnp.where(mask[..., None], loss, 0.0)
        return _reduce(loss, self.reduction)


@dataclasses.dataclass(frozen=True)
class UniformLoss:
    """PU-GAN-style uniformity: penalize deviation of local density from
    the expected density at several ball radii."""

    npoint: int = 256
    radii: tuple[float, ...] = (0.004, 0.006, 0.008, 0.010, 0.012)
    # Kept for reference-API compatibility; counts are exact (uncapped)
    # since round 2, so nsample no longer limits the chi^2 statistic.
    nsample: int = 32
    reduction: str = "mean"

    def __call__(self, xyz, mask=None):
        from pytorch_points_tpu.ops import furthest_point_sample
        from pytorch_points_tpu.ops.pairwise import pairwise_sqdist
        from pytorch_points_tpu.ops.sampling import gather_points

        if mask is not None:
            # expected density counts only the valid points
            n = jnp.sum(mask, axis=1).astype(jnp.float32)[:, None]
        else:
            n = xyz.shape[1]
        fidx = furthest_point_sample(xyz, self.npoint, mask=mask)
        centers = gather_points(xyz, fidx)
        # Uncapped in-ball counts (ball_query clips counts at nsample,
        # which would silently under-penalize dense regions once a ball
        # saturates — the chi^2 needs the true density; divergence from
        # the reference's capped counts is recorded in PARITY.md).  The
        # [B, npoint, N] pairwise plane is chunked along N so the
        # transient stays bounded (~32 MB) at large N.
        import math

        big_n = xyz.shape[1]
        cs = max(256, min(big_n, (32 << 20) // (4 * xyz.shape[0] * self.npoint)))
        cnts = [0.0 for _ in self.radii]
        for s in range(0, big_n, cs):
            d2 = pairwise_sqdist(centers, xyz[:, s : s + cs])
            if mask is not None:
                d2 = jnp.where(mask[:, None, s : s + cs], d2, jnp.inf)
            for ri, p in enumerate(self.radii):
                r = math.sqrt(p)  # p = disk-area fraction
                cnts[ri] = cnts[ri] + jnp.sum(d2 < r * r, axis=-1)
        total = 0.0
        for ri, p in enumerate(self.radii):
            expected = n * p
            chi2 = (cnts[ri].astype(jnp.float32) - expected) ** 2 / expected
            total = total + _reduce(chi2, self.reduction)
        return total / len(self.radii)
