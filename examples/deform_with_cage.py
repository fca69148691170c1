"""Example: fit a cage deformation that turns a sphere into an ellipsoid.

Optimizes cage vertex offsets directly (no network) through the MVC
deformation — demonstrates that gradients flow through the cage pipeline.

    python examples/deform_with_cage.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_points_tpu.geo import deform_with_cage, mean_value_coordinates
from pytorch_points_tpu.losses import ChamferLoss
from pytorch_points_tpu.utils import geometry_utils


def main():
    rng = np.random.default_rng(0)
    # source: points on a unit sphere; target: squashed ellipsoid
    pts = rng.standard_normal((512, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    target = pts * np.array([1.0, 0.5, 1.0], np.float32)

    cage_v, cage_f = geometry_utils.generate_icosphere(1, radius=1.5)
    weights = mean_value_coordinates(jnp.asarray(pts), cage_v, cage_f)

    cl = ChamferLoss()
    tx = optax.adam(1e-2)
    offsets = jnp.zeros_like(jnp.asarray(cage_v))
    opt = tx.init(offsets)

    @jax.jit
    def step(offsets, opt):
        def loss_fn(offsets):
            deformed = deform_with_cage(weights, jnp.asarray(cage_v) + offsets)
            return cl(deformed[None], jnp.asarray(target)[None])

        loss, g = jax.value_and_grad(loss_fn)(offsets)
        upd, opt = tx.update(g, opt, offsets)
        return optax.apply_updates(offsets, upd), opt, loss

    for i in range(200):
        offsets, opt, loss = step(offsets, opt)
        if i % 50 == 0 or i == 199:
            print(f"step {i:3d}  chamfer {float(loss):.6f}")
    assert float(loss) < 1e-3, "cage fit did not converge"
    print("cage deformation fit ok")


if __name__ == "__main__":
    main()
