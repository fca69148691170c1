"""Example: train the flagship autoencoder with Chamfer+EMD on synthetic
clouds, data-parallel over every available device.

    python examples/train_autoencoder.py --steps 50 --batch 8 --n 1024
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from pytorch_points_tpu import parallel
from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils import save_network
from pytorch_points_tpu.utils.benchmark import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--emd-weight", type=float, default=0.1)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute policy (f32 params)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint each SA/FP stage (larger N per chip)")
    args = ap.parse_args()

    ndev = jax.device_count()
    assert args.batch % ndev == 0, "batch must divide device count"
    mesh = parallel.make_mesh({"data": ndev})
    model = PointCloudAutoencoder(
        npoint1=args.n // 4, npoint2=args.n // 16,
        dtype=jnp.bfloat16 if args.bf16 else None, remat=args.remat,
        rngs=nnx.Rngs(0)
    )
    loss_fn = parallel.reconstruction_loss(emd_weight=args.emd_weight)
    step, state = parallel.make_train_step(
        model, optax.adam(args.lr), mesh, loss_fn
    )

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        batch = {
            "points": jnp.asarray(
                rng.uniform(-1, 1, (args.batch, args.n, 3)), jnp.float32
            )
        }
        state, loss = step(state, batch)
        if i % 10 == 0 or i == args.steps - 1:
            device_sync(loss)
            print(f"step {i:4d}  loss {float(loss):.5f}  "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step avg)")
    if args.ckpt:
        save_network(state.params, args.ckpt, step=args.steps)


if __name__ == "__main__":
    main()
