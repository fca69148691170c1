"""Example: render a .ply cloud with the differentiable splatter.

    python examples/render_cloud.py input.ply output.png [image_size]
"""

import sys

import jax.numpy as jnp
import numpy as np

from pytorch_points_tpu.geo import Camera, render_points
from pytorch_points_tpu.utils import pc_utils


def main():
    inp, out = sys.argv[1], sys.argv[2]
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    xyz = pc_utils.read_ply(inp)
    xyz, _, _ = pc_utils.normalize_point_cloud(xyz)
    # color by height
    t = (xyz[:, 1] - xyz[:, 1].min()) / max(np.ptp(xyz[:, 1]), 1e-6)
    colors = np.stack([t, 0.4 + 0.2 * t, 1.0 - t], -1).astype(np.float32)
    img, alpha = render_points(
        jnp.asarray(xyz)[None],
        jnp.asarray(colors)[None],
        camera=Camera(eye=(1.5, 1.5, 2.5), focal=1.8),
        image_size=size,
        splat_radius=0.01,
    )
    arr = (np.clip(np.asarray(img)[0], 0, 1) * 255).astype(np.uint8)
    try:
        import matplotlib

        matplotlib.image.imsave(out, arr)
    except Exception:
        # raw PPM fallback
        with open(out.rsplit(".", 1)[0] + ".ppm", "wb") as f:
            f.write(f"P6 {size} {size} 255\n".encode())
            f.write(arr.tobytes())
    print(f"rendered {xyz.shape[0]} points -> {out}")


if __name__ == "__main__":
    main()
