"""Auto-budget EMD: both distributions + quality."""
import numpy as np
import jax, jax.numpy as jnp
import pytorch_points_tpu as ppt
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

print("hint correlated:", bool(auction._hardness_hint(pred5, x5)))
print("hint random:", bool(auction._hardness_hint(p4, q4)))

f4 = jax.jit(lambda p, q: ppt.earth_mover_distance(p, q)[0])
print("correlated B=16 ms:", measure(f4, pred5, x5) * 1e3, flush=True)
print("random B=32 ms:", measure(f4, p4, q4) * 1e3, flush=True)

try:
    from scipy.optimize import linear_sum_assignment
    for name, (pa, qa) in (("corr", (pred5[:4], x5[:4])),
                           ("rand", (p4[:4], q4[:4]))):
        got = np.asarray(f4(pa, qa), np.float64).mean(1)
        exc = []
        for bi in range(4):
            d2 = ((np.asarray(pa[bi], np.float64)[:, None] -
                   np.asarray(qa[bi], np.float64)[None]) ** 2).sum(-1)
            r, c = linear_sum_assignment(d2)
            exc.append(100 * (got[bi] - d2[r, c].mean()) / d2[r, c].mean())
        print(name, "excess%:", [round(e, 2) for e in exc], flush=True)
except ImportError:
    pass

# gmm symmetric-clustered sanity: must take the default budget
qrng = np.random.default_rng(7)
def gmm(b, npts, k=8, spread=0.15):
    centers = qrng.uniform(-1, 1, (b, k, 3))
    which = qrng.integers(0, k, (b, npts))
    return jnp.asarray(centers[np.arange(b)[:, None], which]
                       + spread * qrng.standard_normal((b, npts, 3)), jnp.float32)
g1, g2 = gmm(8, 2048), gmm(8, 2048)
print("hint gmm:", bool(auction._hardness_hint(g1, g2)))

print("gmm default-budget ms:",
      measure(jax.jit(lambda a, b: ppt.earth_mover_distance(a, b)[0]), g1, g2) * 1e3)
