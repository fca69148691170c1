"""PointNet++ model families (BASELINE config 5: full SA+FP stack).

``PointCloudAutoencoder`` is the framework's flagship: the exact pipeline
the driver grades — FPS + grouping through SA layers down to a global
code, FP layers (three_nn + three_interpolate) back up, coordinate head,
trained with Chamfer + EMD (see pytorch_points_tpu.parallel.train_step).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.layers import (
    PointNetFPModule,
    PointNetSAModule,
    SharedMLP,
)


def _remat_call(module, *args):
    """Call an nnx module, rematerializing its activations when asked."""
    return nnx.remat(lambda m, *a: m(*a))(module, *args)


def _build_fp_stack(model, norm, dtype, rngs):
    """The shared fp3/fp2/fp1 decoder stack for the SSG encoder's
    (128, 256, 1024) feature hierarchy."""
    model.fp3 = PointNetFPModule(1024 + 256, [256, 256], norm=norm,
                                 dtype=dtype, rngs=rngs)
    model.fp2 = PointNetFPModule(256 + 128, [256, 128], norm=norm,
                                 dtype=dtype, rngs=rngs)
    model.fp1 = PointNetFPModule(128, [128, 128], norm=norm, dtype=dtype,
                                 rngs=rngs)


def _fp_decode(model, x0, x1, x2, x3, f1, f2, f3):
    """Shared FP-decoder wiring (autoencoder + semseg): three FP stages
    back up the SA hierarchy, honoring ``model.remat``."""
    call = _remat_call if model.remat else (lambda m, *a: m(*a))
    g2 = call(model.fp3, x2, x3, f2, f3)  # x3 is [B,1,3]: global bcast
    g1 = call(model.fp2, x1, x2, f1, g2)
    return call(model.fp1, x0, x1, None, g1)


class PointNet2Encoder(nnx.Module):
    """3-level SA hierarchy -> per-level features + global code."""

    def __init__(
        self,
        npoint1: int = 512,
        npoint2: int = 128,
        radius1: float = 0.2,
        radius2: float = 0.4,
        nsample: int = 32,
        *,
        norm: str | None = "layer",
        dtype=None,
        remat: bool = False,
        rngs: nnx.Rngs,
    ):
        # remat: rematerialize each SA stage's activations in the
        # backward pass (jax.checkpoint) — the grouped [B,P,nsample,C]
        # tensors are the forward's memory peak, so this trades one
        # recompute for the dominant activation storage at large N.
        # Use with stateless norms ("layer"/None); BatchNorm's running
        # stats must not be updated twice.
        self.remat = remat
        self.sa1 = PointNetSAModule(
            0, [64, 64, 128], npoint=npoint1, radius=radius1,
            nsample=nsample, norm=norm, dtype=dtype, rngs=rngs,
        )
        self.sa2 = PointNetSAModule(
            128, [128, 128, 256], npoint=npoint2, radius=radius2,
            nsample=nsample, norm=norm, dtype=dtype, rngs=rngs,
        )
        self.sa3 = PointNetSAModule(
            256, [256, 512, 1024], group_all=True, norm=norm, dtype=dtype,
            rngs=rngs
        )

    def __call__(self, xyz, mask=None):
        call = _remat_call if self.remat else (lambda m, *a: m(*a))
        xyz1, f1 = call(self.sa1, xyz, None, mask)
        xyz2, f2 = call(self.sa2, xyz1, f1)
        xyz3, f3 = call(self.sa3, xyz2, f2)
        return (xyz, xyz1, xyz2, xyz3), (None, f1, f2, f3)


class PointCloudAutoencoder(nnx.Module):
    """SA encoder -> FP decoder -> per-point coordinate head.

    Reconstructs the input cloud as ``xyz + offsets`` (deformation-style
    decoding keeps the head well-conditioned); train with Chamfer + EMD.
    """

    def __init__(self, npoint1: int = 512, npoint2: int = 128, *,
                 norm: str | None = "layer", dtype=None,
                 remat: bool = False, rngs: nnx.Rngs):
        # dtype: mixed-precision computation dtype (e.g. jnp.bfloat16 on
        # TPU); params stay f32, and the residual add below promotes the
        # prediction back to the coordinates' f32 for the loss kernels.
        # remat: checkpoint each SA/FP stage (see PointNet2Encoder).
        self.remat = remat
        self.encoder = PointNet2Encoder(npoint1, npoint2, norm=norm,
                                        dtype=dtype, remat=remat, rngs=rngs)
        _build_fp_stack(self, norm, dtype, rngs)
        self.head = SharedMLP([128, 64, 3], act_last=False, norm=norm,
                              dtype=dtype, rngs=rngs)

    def __call__(self, xyz, mask=None):
        (x0, x1, x2, x3), (_, f1, f2, f3) = self.encoder(xyz, mask=mask)
        g0 = _fp_decode(self, x0, x1, x2, x3, f1, f2, f3)
        offsets = self.head(g0)
        pred = xyz + offsets
        if mask is not None:
            pred = jnp.where(mask[..., None], pred, 0.0)
        return pred


class PointNet2Classifier(nnx.Module):
    """Classic PointNet++ SSG classifier head."""

    def __init__(self, num_classes: int = 40, *, dtype=None,
                 rngs: nnx.Rngs):
        self.encoder = PointNet2Encoder(dtype=dtype, rngs=rngs)
        self.head = SharedMLP(
            [1024, 512, 256, num_classes], act_last=False, dtype=dtype,
            rngs=rngs
        )

    def __call__(self, xyz, mask=None):
        _, feats = self.encoder(xyz, mask=mask)
        return self.head(feats[3][:, 0, :])  # [B, num_classes] logits


class PointNet2SemSeg(nnx.Module):
    """PointNet++ SSG semantic segmentation: SA encoder + FP decoder +
    per-point class head (the canonical scene/part segmentation family
    the reference's SA/FP stack exists to serve; same SA+FP composition
    as the autoencoder with a logits head instead of coordinates)."""

    def __init__(self, num_classes: int, *, npoint1: int = 512,
                 npoint2: int = 128, norm: str | None = "layer",
                 dtype=None, remat: bool = False, rngs: nnx.Rngs):
        self.remat = remat
        self.encoder = PointNet2Encoder(npoint1, npoint2, norm=norm,
                                        dtype=dtype, remat=remat, rngs=rngs)
        _build_fp_stack(self, norm, dtype, rngs)
        self.head = SharedMLP([128, 128, num_classes], act_last=False,
                              norm=norm, dtype=dtype, rngs=rngs)

    def __call__(self, xyz, mask=None):
        """[B, N, 3] -> per-point logits [B, N, num_classes]."""
        (x0, x1, x2, x3), (_, f1, f2, f3) = self.encoder(xyz, mask=mask)
        g0 = _fp_decode(self, x0, x1, x2, x3, f1, f2, f3)
        logits = self.head(g0)
        if mask is not None:
            logits = jnp.where(mask[..., None], logits, 0.0)
        return logits
