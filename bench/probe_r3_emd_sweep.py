"""Sweep auction budget vs JV-endgame load on correlated clouds."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import auction
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
from flax import nnx
from pytorch_points_tpu.models import PointCloudAutoencoder
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
x5 = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
pred5 = jax.lax.stop_gradient(model(x5))
eps = 0.005

for iters, phases in ((15, 3), (25, 3), (40, 3), (60, 3), (30, 4)):
    full = jax.jit(lambda p, q, i=iters, ph=phases: auction.auction_assignment(
        p, q, eps, i, phases=ph))
    cnt = auction.auction_unassigned_count(pred5, x5, eps, iters, phases=phases)
    t = measure(full, pred5, x5) * 1e3
    a = full(pred5, x5)
    qsel = jnp.take_along_axis(x5, a[..., None], axis=1)
    cost = float(jnp.mean(jnp.sum((pred5 - qsel) ** 2, -1)))
    print(f"iters={iters} phases={phases}: stragglers={int(jnp.mean(cnt))} "
          f"full={t:.1f}ms mean_d2={cost:.5f}", flush=True)
