"""Reference-compatible API surface (channels-first).

The native framework API is channels-last [B, N, C] (MXU-friendly,
SURVEY.md §8).  This module mirrors the reference's
``pytorch_points.network.operations`` signatures — channels-first
[B, C, N] tensors and NCHW flags — as thin transposing wrappers, so
downstream code written against the reference can port mechanically.
Signatures follow SURVEY.md §3.2 P1 (reference source unavailable —
see SURVEY.md §0 — so the exact keyword spelling is by lineage [K]).
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorch_points_tpu import ops as _ops


def _to_bnc(x):
    return jnp.swapaxes(x, 1, 2)


def _to_bcn(x):
    return jnp.swapaxes(x, 1, 2)


def furthest_point_sample(xyz, npoint: int, NCHW: bool = True):
    """Reference: returns (sampled_xyz, idx); xyz is [B,3,N] when NCHW."""
    pts = _to_bnc(xyz) if NCHW else xyz
    idx = _ops.furthest_point_sample(pts, npoint)
    sampled = _ops.gather_points(pts, idx)
    return (_to_bcn(sampled) if NCHW else sampled), idx


def gather_points(features, idx):
    """features [B,C,N], idx [B,K] -> [B,C,K]."""
    return _to_bcn(_ops.gather_points(_to_bnc(features), idx))


def group_points(features, idx):
    """features [B,C,N], idx [B,P,S] -> [B,C,P,S]."""
    g = _ops.group_points(_to_bnc(features), idx)  # [B,P,S,C]
    return jnp.transpose(g, (0, 3, 1, 2))


def ball_query(radius: float, nsample: int, xyz, new_xyz):
    """Reference arg order (radius, nsample, support, centers); both
    [B,N,3]/[B,P,3] channels-last as in the PointNet++ wrappers.
    Returns idx [B,P,nsample]."""
    idx, _ = _ops.ball_query(xyz, new_xyz, radius, nsample)
    return idx


def group_knn(k: int, query, points, unique: bool = True, NCHW: bool = True):
    """Reference: returns (grouped_points [B,C,P,k], idx, distances)."""
    q = _to_bnc(query) if NCHW else query
    s = _to_bnc(points) if NCHW else points
    grouped, idx, dist = _ops.group_knn(k, q, s, unique=unique)
    if NCHW:
        grouped = jnp.transpose(grouped, (0, 3, 1, 2))
    return grouped, idx, dist


def three_nn(unknown, known):
    """[B,n,3], [B,m,3] -> (dist [B,n,3] squared, idx)."""
    return _ops.three_nn(unknown, known)


def three_interpolate(features, idx, weight):
    """features [B,C,m], idx/weight [B,n,3] -> [B,C,n]."""
    return _to_bcn(_ops.three_interpolate(_to_bnc(features), idx, weight))


def nndistance(pred, gt):
    """[B,N,3], [B,M,3] -> (dist1, idx1, dist2, idx2) — squared dists."""
    return _ops.nndistance(pred, gt)


def sample_and_group(xyz, points, npoint: int, nsample: int, radius: float,
                     use_xyz: bool = True):
    """Reference NCHW sample_and_group: xyz [B,3,N], points [B,C,N].

    Returns (new_xyz [B,3,P], new_points [B,C',P,S], idx, grouped_xyz)."""
    x = _to_bnc(xyz)
    f = _to_bnc(points) if points is not None else None
    new_xyz, new_feats, idx, grouped_xyz = _ops.sample_and_group(
        x, f, npoint, nsample, radius, use_xyz=use_xyz
    )
    return (
        _to_bcn(new_xyz),
        jnp.transpose(new_feats, (0, 3, 1, 2)),
        idx,
        jnp.transpose(grouped_xyz, (0, 3, 1, 2)),
    )


def normalize_point_batch(pc, NCHW: bool = True):
    """Reference: (pc, centroid, furthest_distance), same layout in/out."""
    x = _to_bnc(pc) if NCHW else pc
    out, centroid, furthest = _ops.normalize_point_batch(x)
    if NCHW:
        return _to_bcn(out), _to_bcn(centroid), furthest
    return out, centroid, furthest


def batch_normals(xyz, nn_size: int = 20, NCHW: bool = True):
    """Reference: PCA normals; xyz [B,3,N] when NCHW."""
    x = _to_bnc(xyz) if NCHW else xyz
    n = _ops.batch_normals(x, k=nn_size)
    return _to_bcn(n) if NCHW else n


# torch <-> jax migration helpers (lazy torch import inside)
from pytorch_points_tpu.compat import torch_bridge  # noqa: E402,F401
