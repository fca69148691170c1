"""Independent NumPy oracles for every op (SURVEY.md §5).

Deliberately written as naive loops / dense ops with float32 math so that
argmin/argmax tie-breaking (lowest index wins) matches the framework's
contract.  These are the ground truth the jnp/Pallas paths are tested
against; they share no code with the package.
"""

from __future__ import annotations

import itertools

import numpy as np


def pairwise_sqdist(p, q):
    p = p.astype(np.float32)
    q = q.astype(np.float32)
    diff = p[..., :, None, :] - q[..., None, :, :]
    return np.sum(diff * diff, axis=-1, dtype=np.float32)


def nndistance(p, q):
    d = pairwise_sqdist(p, q)  # [B,N,M]
    idx1 = np.argmin(d, axis=-1).astype(np.int32)
    dist1 = np.take_along_axis(d, idx1[..., None], axis=-1)[..., 0]
    idx2 = np.argmin(d, axis=-2).astype(np.int32)
    dist2 = np.take_along_axis(d, idx2[..., None, :], axis=-2)[..., 0, :]
    return dist1, idx1, dist2, idx2


def furthest_point_sample(xyz, k, mask=None):
    b, n, _ = xyz.shape
    xyz = xyz.astype(np.float32)
    out = np.zeros((b, k), dtype=np.int32)
    for bi in range(b):
        valid = np.ones(n, bool) if mask is None else mask[bi].astype(bool)
        mind = np.where(valid, np.float32(1e10), -np.inf).astype(np.float32)
        last = int(np.argmax(valid))
        out[bi, 0] = last
        for j in range(1, k):
            d = np.sum((xyz[bi] - xyz[bi, last]) ** 2, axis=-1, dtype=np.float32)
            upd = np.where(valid, d, -np.inf).astype(np.float32)
            mind = np.minimum(mind, upd)
            last = int(np.argmax(mind))
            out[bi, j] = last
    return out


def knn(query, support, k):
    d = pairwise_sqdist(query, support)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k].astype(np.int32)
    dist = np.take_along_axis(d, idx, axis=-1)
    return dist, idx


def ball_query(xyz, centroids, radius, nsample, mask=None):
    b, n, _ = xyz.shape
    p = centroids.shape[1]
    idx = np.zeros((b, p, nsample), dtype=np.int32)
    cnt = np.zeros((b, p), dtype=np.int32)
    r2 = np.float32(radius) ** 2
    for bi in range(b):
        for pi in range(p):
            c = 0
            for ni in range(n):
                if mask is not None and not mask[bi, ni]:
                    continue
                d2 = np.sum(
                    (xyz[bi, ni].astype(np.float32) - centroids[bi, pi].astype(np.float32)) ** 2,
                    dtype=np.float32,
                )
                if d2 < r2:
                    if c == 0:
                        idx[bi, pi, :] = ni  # pad-by-first-hit semantics
                    if c < nsample:
                        idx[bi, pi, c] = ni
                    c += 1
                    if c >= nsample:
                        break
            cnt[bi, pi] = min(c, nsample)
    return idx, cnt


def group_points(features, idx):
    b, p, s = idx.shape
    out = np.empty((b, p, s, features.shape[-1]), dtype=features.dtype)
    for bi in range(b):
        out[bi] = features[bi][idx[bi]]
    return out


def three_nn(unknown, known):
    dist, idx = knn(unknown, known, 3)
    return dist, idx


def three_interpolate(features, idx, weight):
    b, n, k = idx.shape
    out = np.zeros((b, n, features.shape[-1]), dtype=np.float32)
    for bi in range(b):
        for ni in range(n):
            for j in range(k):
                out[bi, ni] += weight[bi, ni, j] * features[bi, idx[bi, ni, j]]
    return out


def emd_optimal(p, q):
    """Exact optimal assignment cost by brute force (tiny N only)."""
    b, n, _ = p.shape
    assert n <= 7, "brute force only for tiny clouds"
    d = pairwise_sqdist(p, q)
    costs = np.zeros(b, np.float32)
    assigns = np.zeros((b, n), np.int32)
    for bi in range(b):
        best = np.inf
        for perm in itertools.permutations(range(n)):
            c = sum(d[bi, i, perm[i]] for i in range(n))
            if c < best:
                best = c
                assigns[bi] = perm
        costs[bi] = best
    return costs, assigns
