"""Example: train briefly, export the model as a self-contained StableHLO
artifact, then serve predictions from the artifact alone.

The exported file bakes the weights in as constants — the serving side
never imports the model code or flax, only jax.  This is the deployment
path for the library's models (utils/export.py).

    python examples/export_and_serve.py --steps 10 --n 512
"""

from __future__ import annotations

import argparse
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from pytorch_points_tpu import chamfer_distance
from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils import export_forward, load_exported


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--bf16", action="store_true",
                    help="train/export with the bf16 compute policy")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if args.bf16 else None
    model = PointCloudAutoencoder(npoint1=64, npoint2=16, dtype=dtype,
                                  rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jnp.asarray(rng.uniform(-1, 1, (args.batch, args.n, 3)), jnp.float32)

    @jax.jit
    def step(params, opt_state, xyz):
        def loss_fn(params):
            pred = nnx.merge(graphdef, params)(xyz)
            return chamfer_distance(pred, xyz)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, x)
    print(f"trained {args.steps} steps, final chamfer {float(loss):.5f}")

    # --- export: weights baked in, shape-polymorphic over nothing ------
    trained = nnx.merge(graphdef, params)
    path = os.path.join(tempfile.mkdtemp(), "autoencoder.stablehlo")
    export_forward(trained, x, path=path)
    print(f"exported {os.path.getsize(path)} bytes -> {path}")

    # --- serve: only the artifact + jax ---------------------------------
    serve = load_exported(path)
    query = jnp.asarray(rng.uniform(-1, 1, (args.batch, args.n, 3)),
                        jnp.float32)
    pred = serve(query)
    # compare against the jitted forward: the artifact reproduces the
    # compiled computation exactly (eager bf16 differs in rounding —
    # XLA fuses away intermediate bf16 round-trips under jit).
    live = jax.jit(trained)(query)
    err = float(jnp.max(jnp.abs(pred - live)))
    print(f"served prediction {pred.shape}, max |exported - live| = {err:.2e}")
    assert err < 1e-5
    print("SERVE OK")


if __name__ == "__main__":
    main()
