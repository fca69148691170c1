"""Differentiable mesh operators, TPU-native.

Reference (SURVEY.md §3.2 P4): face/vertex normals, uniform & cotangent
Laplacians, edge lengths, dihedral angles, mean curvature.  The reference
builds sparse torch tensors; XLA has no sparse support, so Laplacians are
expressed as gather + segment_sum over static edge/face index arrays — the
deterministic TPU equivalent (and batched over meshes with shared
topology, the common training setup).

Conventions:
  * verts: [B, V, 3] float (or [V, 3]).
  * faces: [F, 3] int32 (shared across the batch).
  * edges: [E, 2] int32, undirected, as produced by :func:`mesh_edges`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _batched(verts):
    verts = jnp.asarray(verts)
    if verts.ndim == 2:
        return verts[None], True
    return verts, False


def mesh_edges(faces) -> np.ndarray:
    """Unique undirected edges [E, 2] from faces [F, 3] (host-side, static).

    Pure NumPy: topology is static metadata computed once at data-prep
    time, not traced.
    """
    faces = np.asarray(faces)
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0).astype(np.int32)


def face_normals(verts, faces, *, normalize: bool = True):
    """[B, F, 3] face normals (right-hand winding)."""
    v, squeeze = _batched(verts)
    tri = v[:, faces, :]  # [B, F, 3, 3]
    n = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n[0] if squeeze else n


def face_areas(verts, faces):
    """[B, F] triangle areas."""
    v, squeeze = _batched(verts)
    tri = v[:, faces, :]
    n = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    a = 0.5 * jnp.linalg.norm(n, axis=-1)
    return a[0] if squeeze else a


def vertex_normals(verts, faces):
    """[B, V, 3] area-weighted vertex normals via segment-sum scatter."""
    v, squeeze = _batched(verts)
    tri = v[:, faces, :]
    fn = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    # area-weighted: un-normalized face normal already carries 2*area
    nv = v.shape[1]
    flat_faces = jnp.asarray(faces).reshape(-1)  # [F*3]
    acc = jax.vmap(
        lambda f: jax.ops.segment_sum(
            jnp.repeat(f, 3, axis=0), flat_faces, num_segments=nv
        )
    )(fn)
    out = acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-12)
    return out[0] if squeeze else out


def edge_lengths(verts, edges):
    """[B, E] edge lengths."""
    v, squeeze = _batched(verts)
    e = jnp.asarray(edges)
    d = v[:, e[:, 0], :] - v[:, e[:, 1], :]
    out = jnp.linalg.norm(d, axis=-1)
    return out[0] if squeeze else out


def uniform_laplacian(verts, edges, *, normalize: bool = True):
    """Uniform (graph) Laplacian coordinates: L(v_i) = mean_j(v_j) - v_i.

    Matches the reference's sparse uniform Laplacian applied to vertex
    positions, as a gather + segment_sum (deterministic, no sparsity).
    """
    v, squeeze = _batched(verts)
    e = jnp.asarray(edges)
    nv = v.shape[1]
    src = jnp.concatenate([e[:, 0], e[:, 1]])
    dst = jnp.concatenate([e[:, 1], e[:, 0]])

    def one(vb):
        s = jax.ops.segment_sum(vb[dst], src, num_segments=nv)
        deg = jax.ops.segment_sum(
            jnp.ones_like(dst, vb.dtype), src, num_segments=nv
        )
        if normalize:
            return s / jnp.maximum(deg, 1.0)[:, None] - vb
        return s - deg[:, None] * vb

    out = jax.vmap(one)(v)
    return out[0] if squeeze else out


def cot_laplacian(verts, faces, *, eps: float = 1e-10,
                  normalize: str = "weight"):
    """Cotangent-weighted Laplacian coordinates [B, V, 3].

    With w_ij = cot(a) + cot(b) over the angles opposite edge (i, j):
      * normalize="weight": sum_j w_ij (v_j - v_i) / sum_j w_ij —
        displacement toward the cot-weighted neighbor average (the form
        the reference's Laplacian losses use);
      * normalize="area": (1 / (2 A_i)) * sum_j (w_ij/2) (v_j - v_i) —
        the discrete Laplace-Beltrami (mean-curvature normal), with
        A_i = barycentric vertex area;
      * normalize="none": raw sum_j w_ij (v_j - v_i).
    """
    v, squeeze = _batched(verts)
    f = jnp.asarray(faces)
    nv = v.shape[1]

    def one(vb):
        tri = vb[f]  # [F, 3, 3]
        acc = jnp.zeros((nv, 3), vb.dtype)
        wacc = jnp.zeros((nv,), vb.dtype)
        for opp in range(3):
            i = (opp + 1) % 3
            j = (opp + 2) % 3
            a = tri[:, i] - tri[:, opp]
            b = tri[:, j] - tri[:, opp]
            cross = jnp.linalg.norm(jnp.cross(a, b), axis=-1)
            cot = jnp.sum(a * b, -1) / jnp.maximum(cross, eps)  # [F]
            # edge (i, j) gets weight cot(angle at opp); contributes both ways
            vi = f[:, i]
            vj = f[:, j]
            acc = acc + jax.ops.segment_sum(
                cot[:, None] * vb[vj], vi, num_segments=nv
            )
            acc = acc + jax.ops.segment_sum(
                cot[:, None] * vb[vi], vj, num_segments=nv
            )
            wacc = wacc + jax.ops.segment_sum(cot, vi, num_segments=nv)
            wacc = wacc + jax.ops.segment_sum(cot, vj, num_segments=nv)
        if normalize == "weight":
            return acc / jnp.maximum(wacc, eps)[:, None] - vb
        raw = acc - wacc[:, None] * vb  # sum_j w_ij (v_j - v_i)
        if normalize == "none":
            return raw
        # barycentric vertex areas
        fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        fa = 0.5 * jnp.linalg.norm(fn, axis=-1)  # [F]
        va = jax.ops.segment_sum(
            jnp.repeat(fa / 3.0, 3), f.reshape(-1), num_segments=nv
        )
        return raw / (2.0 * jnp.maximum(va, eps))[:, None]

    out = jax.vmap(one)(v)
    return out[0] if squeeze else out


def mean_curvature(verts, faces):
    """[B, V] mean curvature |Laplace-Beltrami(v)| / 2 (sphere R -> 1/R)."""
    lap = cot_laplacian(verts, faces, normalize="area")
    return 0.5 * jnp.linalg.norm(lap, axis=-1)


def dihedral_angles(verts, faces):
    """Cosine of dihedral angles between face pairs sharing an edge.

    Returns (cos_angles [B, Ei], edge_pairs [Ei, 2] face-index pairs) —
    interior edges only.  Topology (pairing) is host-side NumPy.
    """
    faces_np = np.asarray(faces)
    # map undirected edge -> faces containing it
    from collections import defaultdict

    edge2faces = defaultdict(list)
    for fi, (a, b, c) in enumerate(faces_np):
        for u, w in ((a, b), (b, c), (c, a)):
            edge2faces[(min(u, w), max(u, w))].append(fi)
    pairs = np.array(
        [fs[:2] for fs in edge2faces.values() if len(fs) == 2], dtype=np.int32
    )
    if pairs.size == 0:
        pairs = np.zeros((0, 2), np.int32)
    v, squeeze = _batched(verts)
    n = face_normals(v, faces_np)  # [B, F, 3]
    cos = jnp.sum(n[:, pairs[:, 0]] * n[:, pairs[:, 1]], axis=-1)
    return (cos[0] if squeeze else cos), pairs


def point_laplacian(xyz, k: int = 8, mask=None, idx=None, impl: str = "auto"):
    """Graph-Laplacian coordinates of a point cloud via its kNN graph.

    Returns (lap [B, N, 3], idx [B, N, k]) so the neighborhood can be
    reused on a second cloud (the reference's PointLaplacianLoss compares
    Laplacians of two clouds under the SAME neighborhoods).
    """
    from pytorch_points_tpu.ops.grouping import group_points, knn

    if idx is None:
        _, idx = knn(xyz, xyz, k + 1, support_mask=mask, impl=impl)
        idx = idx[..., 1:]  # drop self
    nbrs = group_points(xyz, idx)  # [B, N, k, 3]
    lap = jnp.mean(nbrs, axis=2) - xyz
    if mask is not None:
        lap = jnp.where(mask[..., None], lap, 0.0)
    return lap, idx
