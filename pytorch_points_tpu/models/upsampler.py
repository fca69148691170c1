"""3PU-style point-cloud upsampler (the reference's home project).

Feature extraction with DenseEdgeConv units (the reference's signature
layer), point-shuffle expansion by ratio r, coordinate regression head.
Train with the one-sided/filtered ChamferLoss + RepulsionLoss combo the
3PU lineage uses.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.layers import DenseEdgeConv, SharedMLP


class PointUpsampler(nnx.Module):
    """3PU-style upsampler: DenseEdgeConv features, ratio-r point-shuffle
    expansion with learned grid codes, residual coordinate regression."""

    def __init__(
        self,
        ratio: int = 4,
        channels: int = 24,
        growth_rate: int = 24,
        dense_n: int = 3,
        k: int = 16,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        # dtype: mixed-precision computation dtype (params stay f32);
        # the residual add below promotes offsets back to the
        # coordinates' f32 so the loss kernels see full precision.
        self.ratio = ratio
        self.lift = nnx.Linear(3, channels, dtype=dtype, rngs=rngs)
        self.edge1 = DenseEdgeConv(channels, growth_rate, dense_n, k,
                                   dtype=dtype, rngs=rngs)
        c1 = channels + dense_n * growth_rate
        self.edge2 = DenseEdgeConv(c1, growth_rate, dense_n, k,
                                   dtype=dtype, rngs=rngs)
        c2 = c1 + dense_n * growth_rate
        # expansion: each point spawns `ratio` children, each with its own
        # learned code (grid trick from PU-Net/3PU).
        self.expand = SharedMLP([c2 + 2, 128, 128], dtype=dtype, rngs=rngs)
        self.head = SharedMLP([128, 64, 3], act_last=False, dtype=dtype,
                              rngs=rngs)

    def __call__(self, xyz, mask=None):
        """[B, N, 3] -> [B, N * ratio, 3]."""
        b, n, _ = xyz.shape
        f = self.lift(xyz)
        f = self.edge1(f, xyz=xyz, mask=mask)
        f = self.edge2(f, xyz=xyz, mask=mask)  # [B, N, C2]
        r = self.ratio
        # 2D grid codes distinguish the r children of each parent.
        g = jnp.stack(
            [
                jnp.cos(2 * jnp.pi * jnp.arange(r) / r),
                jnp.sin(2 * jnp.pi * jnp.arange(r) / r),
            ],
            axis=-1,
        ).astype(f.dtype)  # [r, 2]
        fr = jnp.repeat(f, r, axis=1)  # [B, N*r, C2]
        gr = jnp.tile(g, (n, 1))[None].repeat(b, axis=0)  # [B, N*r, 2]
        h = self.expand(jnp.concatenate([fr, gr], axis=-1))
        offsets = self.head(h)
        parent = jnp.repeat(xyz, r, axis=1)
        return parent + offsets
