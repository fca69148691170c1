"""DenseEdgeConv — the 3PU densely-connected edge convolution
(reference layers.py, SURVEY.md §3.2 P3).

For each point: build kNN edge features (neighbor - center), run a first
conv, then ``n - 1`` further convs each consuming the concatenation of all
previous layer outputs (dense connectivity), max-pool over the
neighborhood, and concatenate with the input feature.

Output channels = in_channels + n * growth_rate.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.ops import group_points, knn


class DenseEdgeConv(nnx.Module):
    """Densely-connected edge convolution over kNN graphs (3PU).

    Output channels = in_channels + n * growth_rate; see the module
    docstring for the layer's structure."""

    def __init__(
        self,
        in_channels: int,
        growth_rate: int,
        n: int = 3,
        k: int = 16,
        *,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        """dtype: mixed-precision computation dtype (params stay f32);
        ``jnp.bfloat16`` keeps the dense-connectivity matmuls on the
        MXU's native bf16 path.  The kNN graph itself is built on the
        caller's coordinates at full precision."""
        self.k = k
        self.n = n
        self.growth_rate = growth_rate
        # first conv sees (center, neighbor - center) pairs
        self.first = nnx.Linear(2 * in_channels, growth_rate, dtype=dtype,
                                rngs=rngs)
        convs = []
        cin = in_channels + growth_rate
        for _ in range(n - 1):
            convs.append(nnx.Linear(cin, growth_rate, dtype=dtype, rngs=rngs))
            cin += growth_rate
        self.convs = nnx.List(convs)

    @property
    def out_channels(self) -> int:
        return self.first.in_features // 2 + self.n * self.growth_rate

    def __call__(self, features, xyz=None, mask=None):
        """[B, N, C] (+ optional xyz for the kNN metric) -> [B, N, C + n*g].

        The kNN graph is built in feature space when ``xyz`` is None
        (dynamic graph, DGCNN-style) or in coordinate space otherwise.
        """
        ref = features if xyz is None else xyz
        _, idx = knn(ref, ref, self.k + 1, support_mask=mask)
        idx = idx[..., 1:]  # drop self

        nbrs = group_points(features, idx)  # [B, N, k, C]
        center = features[:, :, None, :]
        edge = jnp.concatenate(
            [jnp.broadcast_to(center, nbrs.shape), nbrs - center], axis=-1
        )
        y = nnx.relu(self.first(edge))  # [B, N, k, g]
        x = jnp.broadcast_to(center, nbrs.shape)  # input replicated per edge
        h = jnp.concatenate([x, y], axis=-1)
        for conv in self.convs:
            y = nnx.relu(conv(h))
            h = jnp.concatenate([h, y], axis=-1)
        out = jnp.max(h, axis=2)  # [B, N, C + n*g]
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out
