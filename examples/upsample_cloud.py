"""Example: 4x upsample a .ply cloud with the 3PU-style PointUpsampler
(untrained weights — demonstrates the inference pipeline end-to-end).

    python examples/upsample_cloud.py input.ply output.ply
"""

import sys

import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_points_tpu.models import PointUpsampler
from pytorch_points_tpu.utils import pc_utils


def main():
    inp, out = sys.argv[1], sys.argv[2]
    xyz = pc_utils.read_ply(inp)
    xyz, centroid, radius = pc_utils.normalize_point_cloud(xyz)
    model = PointUpsampler(ratio=4, rngs=nnx.Rngs(0))
    up = model(jnp.asarray(xyz)[None])[0]
    up = np.asarray(up) * radius[0] + centroid[0]
    pc_utils.save_ply(up, out)
    print(f"{xyz.shape[0]} -> {up.shape[0]} points written to {out}")


if __name__ == "__main__":
    main()
