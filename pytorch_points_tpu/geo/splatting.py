"""Differentiable point splatting (DSS lineage, SURVEY.md §1).

The reference library is the utility layer under DSS (differentiable
surface splatting); this module provides the TPU-native rendering
primitive of that family: screen-space gaussian splats with a soft
z-buffer, fully differentiable w.r.t. point positions, colors and splat
size.  Everything is dense [pixels x points] math — XLA fuses it into a
few large VPU/MXU passes, no rasterizer needed.

Two kernels:
  * isotropic screen-space gaussians (``normals=None``) — the "lite"
    formulation;
  * EWA ellipses (``normals=[B,N,3]``) — each point is an oriented disk;
    its screen footprint is the anisotropic gaussian induced by the
    projection Jacobian acting on the disk's tangent frame, so gradients
    flow to the NORMALS as well (the property DSS paper models surface
    orientation with).
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

    def rotation(self):
        eye = jnp.asarray(self.eye, jnp.float32)
        fwd = jnp.asarray(self.target, jnp.float32) - eye
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(fwd, jnp.asarray(self.up, jnp.float32))
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, fwd)
        return jnp.stack([right, up, -fwd])  # [3,3] world->cam

    def uv_jacobian(self, cam_xyz):
        """d(uv)/d(cam xyz) at each camera-space point: [..., 2, 3]."""
        if self.focal is None:
            j = jnp.zeros(cam_xyz.shape[:-1] + (2, 3), jnp.float32)
            j = j.at[..., 0, 0].set(1.0 / self.ortho_scale)
            j = j.at[..., 1, 1].set(1.0 / self.ortho_scale)
            return j
        x, y = cam_xyz[..., 0], cam_xyz[..., 1]
        z = jnp.maximum(-cam_xyz[..., 2], 1e-6)  # positive depth
        f = self.focal
        zero = jnp.zeros_like(z)
        # uv = f * (x, y) / z with z = -cam_z: d uv / d cam_z = +f*x/z^2
        row0 = jnp.stack([f / z, zero, f * x / (z * z)], -1)
        row1 = jnp.stack([zero, f / z, f * y / (z * z)], -1)
        return jnp.stack([row0, row1], -2)  # [..., 2, 3]


def _ewa_inverse_cov(xyz, normals, camera, splat_radius, min_footprint):
    """Per-point inverse screen-space covariance (invA, invB, invC).

    Each point is a world-space disk of radius ``splat_radius`` oriented
    by its normal; the screen footprint is the gaussian with covariance
    J T (J T)^T where T spans the disk's tangent frame and J is the
    projection Jacobian — the EWA ellipse.  Fully differentiable in the
    normals (the tangent-helper selection is locally constant).
    """
    cam = camera.world_to_cam(xyz)  # [B,N,3]
    rot = camera.rotation()
    nrm = jnp.asarray(normals, jnp.float32) @ rot.T
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8
    )
    # tangent frame: helper axis least aligned with the normal (selection
    # treated as locally constant — it is piecewise constant anyway)
    pick_z = jax.lax.stop_gradient(jnp.abs(nrm[..., 2]) < 0.9)
    helper = jnp.where(
        pick_z[..., None],
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    t1 = jnp.cross(nrm, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
    t2 = jnp.cross(nrm, t1)  # unit, ⊥ n and t1

    j = camera.uv_jacobian(cam)  # [B,N,2,3]
    a1 = splat_radius * jnp.einsum("bnij,bnj->bni", j, t1)  # [B,N,2]
    a2 = splat_radius * jnp.einsum("bnij,bnj->bni", j, t2)
    va = a1[..., 0] ** 2 + a2[..., 0] ** 2 + min_footprint  # Σ00
    vb = a1[..., 0] * a1[..., 1] + a2[..., 0] * a2[..., 1]  # Σ01
    vc = a1[..., 1] ** 2 + a2[..., 1] ** 2 + min_footprint  # Σ11
    det = jnp.maximum(va * vc - vb * vb, 1e-16)
    return vc / det, -vb / det, va / det, nrm[..., 2]


def render_points(
    xyz,
    colors=None,
    *,
    normals=None,
    camera: Camera = Camera(),
    image_size: int = 128,
    splat_radius: float = 0.02,
    depth_temperature: float = 1e-2,
    mask=None,
    backface: str = "none",
):
    """Differentiable splat rendering.

    Args:
      xyz: [B, N, 3] world-space points.
      colors: [B, N, C] per-point colors (default: all-ones intensity).
      normals: optional [B, N, 3] world-space normals.  When given, each
        point renders as an EWA ellipse — the screen-space footprint of a
        world-space disk of radius ``splat_radius`` oriented by the
        normal — and gradients flow to the normals (DSS surface
        splatting).  When None: isotropic gaussian with ``splat_radius``
        as the NDC sigma.
      camera: Camera.
      image_size: output resolution (square).
      splat_radius: NDC sigma (isotropic) or world-space disk radius (EWA).
      depth_temperature: soft z-buffer temperature (smaller = harder
        occlusion).
      mask: optional [B, N] validity mask.
      backface: "none" (two-sided splats) or "soft" (weight scaled by a
        sigmoid of the camera-facing normal component; requires normals).

    Returns:
      (image [B, H, W, C], alpha [B, H, W]) — alpha is the splat coverage.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    b, n, _ = xyz.shape
    if colors is None:
        colors = jnp.ones((b, n, 1), jnp.float32)
    uv, depth = camera.project(xyz)  # [B,N,2], [B,N]

    if normals is not None:
        # half-pixel minimal footprint keeps tiny/edge-on splats visible
        min_fp = (0.5 * 2.0 / image_size) ** 2
        ia, ib, ic, n_camz = _ewa_inverse_cov(
            xyz, normals, camera, splat_radius, min_fp
        )
    else:
        inv = 1.0 / splat_radius**2
        ia = jnp.full((b, n), inv)
        ib = jnp.zeros((b, n))
        ic = jnp.full((b, n), inv)
        n_camz = jnp.ones((b, n))
    face = (
        jax.nn.sigmoid(n_camz / 0.1) if backface == "soft"
        else jnp.ones((b, n))
    )

    px = jnp.linspace(-1.0, 1.0, image_size)
    gy, gx = jnp.meshgrid(px, px, indexing="ij")
    pix = jnp.stack([gx, -gy], axis=-1).reshape(-1, 2)  # [P,2], y down

    def render_one(uv_b, depth_b, col_b, valid_b, ia_b, ib_b, ic_b, face_b):
        dx = pix[:, 0:1] - uv_b[None, :, 0]  # [P,N]
        dy = pix[:, 1:2] - uv_b[None, :, 1]
        q = ia_b[None, :] * dx * dx + 2.0 * ib_b[None, :] * dx * dy \
            + ic_b[None, :] * dy * dy
        w = jnp.exp(-0.5 * q) * face_b[None, :]
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
    img, alpha = jax.vmap(render_one)(
        uv, depth, colors, valid, ia, ib, ic, face
    )
    c = colors.shape[-1]
    img = img.reshape(b, image_size, image_size, c)
    alpha = alpha.reshape(b, image_size, image_size)
    return img * alpha[..., None], alpha
