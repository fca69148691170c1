"""Where does correlated-EMD time go: auction main loop vs JV endgame?
Also: does an NN-based price warm start cut either?"""
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

eps, iters, phases = 0.005, 15, 3

own = jax.jit(lambda p, q: auction._auction_owner(p, q, eps, iters, 256, phases, 6.0)[0])
print("auction-only correlated ms:", measure(own, pred5, x5) * 1e3)
cnt = auction.auction_unassigned_count(pred5, x5, eps, iters, phases=phases)
print("stragglers/batch:", np.asarray(cnt))

full = jax.jit(lambda p, q: auction.auction_assignment(p, q, eps, iters, phases=phases))
print("full (auction+endgame) ms:", measure(full, pred5, x5) * 1e3)

# random for contrast
p4 = jnp.asarray(rng.standard_normal((16, 2048, 3)), jnp.float32)
q4 = jnp.asarray(rng.standard_normal((16, 2048, 3)), jnp.float32)
print("auction-only random ms:", measure(own, p4, q4) * 1e3)
print("stragglers/batch random:", np.asarray(auction.auction_unassigned_count(p4, q4, eps, iters, phases=phases)))
print("full random ms:", measure(full, p4, q4) * 1e3)
