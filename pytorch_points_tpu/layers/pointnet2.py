"""PointNet++ set-abstraction / feature-propagation modules.

Reference call stacks: SURVEY.md §4.3 (SA = sample_and_group -> shared MLP
-> max-pool over neighbors) and §4.4 (FP = three_nn -> inverse-distance
three_interpolate -> concat skip -> shared MLP).  Where the reference
launches four CUDA kernels per SA layer, here the whole layer is one XLA
program around the Pallas FPS/ball-query kernels.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.layers.blocks import SharedMLP
from pytorch_points_tpu.ops import (
    group_all,
    interpolation_weights,
    sample_and_group,
    sample_and_group_sorted,
    three_interpolate,
    three_nn,
)


class PointNetSAModule(nnx.Module):
    """Set abstraction: FPS -> (ball query | kNN) group -> MLP -> max-pool.

    Args:
      in_channels: feature channels of the input (0 if xyz only).
      mlp: output widths of the shared MLP.
      npoint: centroids to sample (None with group_all=True).
      radius: ball radius (None -> kNN grouping).
      nsample: neighbors per centroid.
      use_xyz: concat centered coords to grouped features.
      sorted_pipeline: use the Morton-consistent chunk-pruned grouping
        (ops.sample_and_group_sorted) — the pooled output is the same
        function of the same neighborhood sets, with centroids in Morton
        order and a documented saturated-ball truncation difference;
        measurably faster at large N.  Requires radius grouping, no mask.
    """

    def __init__(
        self,
        in_channels: int,
        mlp: Sequence[int],
        *,
        npoint: int | None = None,
        radius: float | None = None,
        nsample: int = 32,
        use_xyz: bool = True,
        normalize_radius: bool = False,
        group_all: bool = False,
        sorted_pipeline: bool = False,
        norm: str | None = "layer",
        dtype=None,
        rngs: nnx.Rngs,
    ):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.use_xyz = use_xyz
        self.normalize_radius = normalize_radius
        self.group_all = group_all
        self.sorted_pipeline = sorted_pipeline
        cin = in_channels + (3 if use_xyz or in_channels == 0 else 0)
        self.mlp = SharedMLP([cin, *mlp], norm=norm, dtype=dtype, rngs=rngs)

    def __call__(self, xyz, features=None, mask=None):
        """[B,N,3], [B,N,C] -> (new_xyz [B,P,3], new_features [B,P,mlp[-1]])."""
        if self.group_all:
            new_xyz, grouped, _, _ = group_all(
                xyz, features, use_xyz=self.use_xyz
            )
        elif (self.sorted_pipeline and self.radius is not None
              and mask is None):
            new_xyz, grouped, _, _, _ = sample_and_group_sorted(
                xyz,
                features,
                self.npoint,
                self.nsample,
                self.radius,
                use_xyz=self.use_xyz,
                normalize_radius=self.normalize_radius,
            )
        else:
            new_xyz, grouped, _, _ = sample_and_group(
                xyz,
                features,
                self.npoint,
                self.nsample,
                self.radius,
                use_xyz=self.use_xyz,
                normalize_radius=self.normalize_radius,
                mask=mask,
            )
        h = self.mlp(grouped)  # [B, P, S, C']
        return new_xyz, jnp.max(h, axis=2)


class PointNetFPModule(nnx.Module):
    """Feature propagation: 3-NN inverse-distance upsampling + skip + MLP."""

    def __init__(self, in_channels: int, mlp: Sequence[int], *,
                 norm: str | None = "layer", dtype=None, rngs: nnx.Rngs):
        self.mlp = SharedMLP([in_channels, *mlp], norm=norm, dtype=dtype,
                             rngs=rngs)

    def __call__(self, xyz_hi, xyz_lo, feat_hi, feat_lo, lo_mask=None):
        """Upsample feat_lo [B,m,C] onto xyz_hi [B,n,3]; concat feat_hi skip.

        Mirrors §4.4: dist,idx = three_nn; w = (1/d)/sum(1/d);
        interp = three_interpolate; out = MLP(concat(skip, interp)).
        """
        if xyz_lo.shape[1] == 1:
            # Degenerate global feature: broadcast.
            interp = jnp.broadcast_to(
                feat_lo, (feat_lo.shape[0], xyz_hi.shape[1], feat_lo.shape[-1])
            )
        else:
            dist, idx = three_nn(xyz_hi, xyz_lo, known_mask=lo_mask)
            weight = interpolation_weights(dist)
            interp = three_interpolate(feat_lo, idx, weight)
        if feat_hi is not None:
            interp = jnp.concatenate([feat_hi, interp], axis=-1)
        return self.mlp(interp)
