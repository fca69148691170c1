"""Adaptive phase-ladder continuation: stragglers + timing, correlated + random."""
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
eps, iters, phases, ti = 0.005, 15, 3, 256

@jax.jit
def stages(p, q):
    owner, price, pp, qq = auction._auction_owner(p, q, eps, iters, ti, phases, 6.0)
    s0 = jnp.sum(owner < 0, axis=1)
    owner2, _ = auction._auction_continue(pp, qq, price, eps, 25, ti)
    s1 = jnp.sum(owner2 < 0, axis=1)
    return s0, s1

s0, s1 = stages(pred5, x5)
print("stragglers before/after ladder continuation:", int(jnp.mean(s0)), int(jnp.mean(s1)))

for ad in (0, 25):
    f = jax.jit(lambda p, q, a=ad: auction.auction_assignment(
        p, q, eps, iters, phases=phases, adaptive_iters=a))
    print(f"correlated adaptive={ad}: ms =", measure(f, pred5, x5) * 1e3, flush=True)

p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
f = jax.jit(lambda p, q: auction.auction_assignment(p, q, eps, iters, phases=phases))
print("random B=32 adaptive-default ms =", measure(f, p4, q4) * 1e3)
