"""Neural-Cages-style deformation model (reference downstream family,
SURVEY.md §1).

Encode source + target clouds with the PointNet++ encoder, predict cage
vertex offsets from the joint code, deform the source points through
precomputed mean value coordinates — deformation itself is one MXU matmul
(geo/cage.py)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.geo.cage import deform_with_cage, mean_value_coordinates
from pytorch_points_tpu.layers import SharedMLP
from pytorch_points_tpu.models.pointnet2 import PointNet2Encoder


class CageDeformer(nnx.Module):
    """Predicts target-driven cage offsets; apply() deforms via MVC."""

    def __init__(self, n_cage_verts: int, *, npoint1: int = 256,
                 npoint2: int = 64, offset_scale: float = 0.1,
                 dtype=None, rngs: nnx.Rngs):
        # dtype: mixed-precision compute dtype for the encoders + head
        # (params stay f32).  The tanh-scaled offsets are promoted to
        # f32 below, so the MVC deformation matmul — the geometric
        # output — always runs at full precision.
        self.encoder_src = PointNet2Encoder(npoint1, npoint2, dtype=dtype,
                                            rngs=rngs)
        self.encoder_tgt = PointNet2Encoder(npoint1, npoint2, dtype=dtype,
                                            rngs=rngs)
        self.head = SharedMLP(
            [2048, 512, 256, n_cage_verts * 3], act_last=False, dtype=dtype,
            rngs=rngs
        )
        self.n_cage_verts = n_cage_verts
        self.offset_scale = offset_scale

    def predict_offsets(self, source, target):
        """[B,N,3] x2 -> cage vertex offsets [B, Vc, 3]."""
        _, fs = self.encoder_src(source)
        _, ft = self.encoder_tgt(target)
        code = jnp.concatenate([fs[3][:, 0, :], ft[3][:, 0, :]], axis=-1)
        off = self.head(code).reshape(-1, self.n_cage_verts, 3)
        return self.offset_scale * jnp.tanh(off)

    def __call__(self, source, target, cage_verts, cage_faces,
                 weights=None):
        """Deform ``source`` toward ``target``.

        Args:
          source/target: [B, N, 3].
          cage_verts: [Vc, 3] source cage (shared across batch).
          cage_faces: [F, 3].
          weights: optional precomputed MVC weights [B, N, Vc] (pass them
            when the source is fixed across steps — they're geometry-only).

        Returns:
          (deformed [B, N, 3], new_cage [B, Vc, 3], weights).
        """
        import jax

        if weights is None:
            weights = jax.vmap(
                lambda s: mean_value_coordinates(s, cage_verts, cage_faces)
            )(source)
        offsets = self.predict_offsets(source, target)
        new_cage = jnp.asarray(cage_verts, jnp.float32)[None] + offsets
        deformed = jnp.einsum(
            "bpv,bvc->bpc", weights, new_cage,
            precision=jax.lax.Precision.HIGHEST,
        )
        return deformed, new_cage, weights
