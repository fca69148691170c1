"""Round-3: EMD timing after the JV pop-body op reduction — random and
correlated (untrained-model-output vs input) clouds."""
import numpy as np
import jax, jax.numpy as jnp
import pytorch_points_tpu as ppt
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
f4 = jax.jit(lambda p, q: ppt.earth_mover_distance(p, q)[0])

p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
print("random B=32 ms:", measure(f4, p4, q4) * 1e3)

from flax import nnx
from pytorch_points_tpu.models import PointCloudAutoencoder
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
x5 = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
pred5 = model(x5)
print("correlated B=16 ms:", measure(f4, pred5, x5) * 1e3)

try:
    from scipy.optimize import linear_sum_assignment
    nb = 4
    pa = np.asarray(pred5[:nb], np.float64); qa = np.asarray(x5[:nb], np.float64)
    got = np.asarray(f4(pred5[:nb], x5[:nb]), np.float64)
    exc = []
    for bi in range(nb):
        d2 = ((pa[bi][:, None] - qa[bi][None]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        exc.append(100 * (got[bi].mean() - d2[r, c].mean()) / d2[r, c].mean())
    print("correlated excess% per elem:", [round(e, 2) for e in exc])
except ImportError:
    pass
