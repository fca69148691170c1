"""Differentiable point splatting (DSS lineage, SURVEY.md §1).

The reference library is the utility layer under DSS (differentiable
surface splatting); this module provides the TPU-native rendering
primitive of that family: screen-space gaussian splats with a soft
z-buffer, fully differentiable w.r.t. point positions, colors and splat
size.  Everything is dense [pixels x points] math — XLA fuses it into a
few large VPU/MXU passes, no rasterizer needed.

This is deliberately the "lite" formulation (isotropic screen-space
gaussians rather than EWA ellipses): it keeps the renderer a pure
function with static shapes while preserving the property DSS is used
for — gradients that move points to explain the image.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Camera:
    """Simple look-at pinhole camera (orthographic when ``focal`` None)."""

    eye: tuple = (0.0, 0.0, 3.0)
    target: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    focal: float | None = None  # None = orthographic
    ortho_scale: float = 1.2  # half-extent of the ortho frustum

    def world_to_cam(self, xyz):
        eye = jnp.asarray(self.eye, jnp.float32)
        fwd = jnp.asarray(self.target, jnp.float32) - eye
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(fwd, jnp.asarray(self.up, jnp.float32))
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, fwd)
        rot = jnp.stack([right, up, -fwd])  # [3,3] camera basis
        return (xyz - eye) @ rot.T

    def project(self, xyz):
        """[..., 3] world -> (uv in [-1,1]^2, depth)."""
        c = self.world_to_cam(xyz)
        z = -c[..., 2]  # positive depth in front of the camera
        if self.focal is None:
            uv = c[..., :2] / self.ortho_scale
        else:
            uv = self.focal * c[..., :2] / jnp.maximum(z[..., None], 1e-6)
        return uv, z


def render_points(
    xyz,
    colors=None,
    *,
    camera: Camera = Camera(),
    image_size: int = 128,
    splat_radius: float = 0.02,
    depth_temperature: float = 1e-2,
    mask=None,
):
    """Differentiable splat rendering.

    Args:
      xyz: [B, N, 3] world-space points.
      colors: [B, N, C] per-point colors (default: all-ones intensity).
      camera: Camera.
      image_size: output resolution (square).
      splat_radius: gaussian sigma in NDC units.
      depth_temperature: soft z-buffer temperature (smaller = harder
        occlusion).
      mask: optional [B, N] validity mask.

    Returns:
      (image [B, H, W, C], alpha [B, H, W]) — alpha is the splat coverage.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    b, n, _ = xyz.shape
    if colors is None:
        colors = jnp.ones((b, n, 1), jnp.float32)
    uv, depth = camera.project(xyz)  # [B,N,2], [B,N]

    px = jnp.linspace(-1.0, 1.0, image_size)
    gy, gx = jnp.meshgrid(px, px, indexing="ij")
    pix = jnp.stack([gx, -gy], axis=-1).reshape(-1, 2)  # [P,2], y down

    def render_one(uv_b, depth_b, col_b, valid_b):
        d2 = jnp.sum((pix[:, None, :] - uv_b[None, :, :]) ** 2, -1)  # [P,N]
        w = jnp.exp(-d2 / (2.0 * splat_radius**2))
        w = jnp.where(valid_b[None, :], w, 0.0)
        # soft z-buffer: nearer points dominate where splats overlap
        zscore = -depth_b[None, :] / depth_temperature
        # large-finite mask (not -inf: empty pixels would softmax to NaN
        # and poison gradients)
        zsoft = jax.nn.softmax(
            jnp.where(w > 1e-6, zscore, -1e9), axis=1
        )
        blend = w * zsoft
        denom = jnp.maximum(jnp.sum(blend, axis=1, keepdims=True), 1e-8)
        img = (blend / denom) @ col_b  # [P, C]
        alpha = 1.0 - jnp.prod(1.0 - jnp.clip(w, 0.0, 1.0 - 1e-6), axis=1)
        return img, alpha

    valid = (
        jnp.ones((b, n), bool) if mask is None else jnp.asarray(mask, bool)
    )
    img, alpha = jax.vmap(render_one)(uv, depth, colors, valid)
    c = colors.shape[-1]
    img = img.reshape(b, image_size, image_size, c)
    alpha = alpha.reshape(b, image_size, image_size)
    return img * alpha[..., None], alpha
