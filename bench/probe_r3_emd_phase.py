"""Per-phase budget sweep on BOTH distributions."""
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
p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
eps = 0.005

for budgets in ((15, 15, 15), (15, 60, 15), (25, 25, 15), (40, 25, 15),
                (60, 25, 15)):
    f = jax.jit(lambda p, q, b=budgets: auction.auction_assignment(
        p, q, eps, 15, phases=3, budgets=b))
    tc = measure(f, pred5, x5) * 1e3
    tr = measure(f, p4, q4) * 1e3
    print(f"budgets={budgets}: correlated B16={tc:.1f}ms random B32={tr:.1f}ms",
          flush=True)
