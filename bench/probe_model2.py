"""Find which cotangent edge costs 60 ms in the config-5 model backward."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
graphdef, params = nnx.split(model)
x = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
sg = jax.lax.stop_gradient


def gsum(g):
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))


def run(params, sg_coords=False, sg_feats=False, sg_fp_dist=False):
    m = nnx.merge(graphdef, params)
    (x0, x1, x2, x3), (_, f1, f2, f3) = m.encoder(x)
    if sg_coords:
        x1, x2, x3 = sg(x1), sg(x2), sg(x3)
    if sg_feats:
        f1, f2, f3 = sg(f1), sg(f2), sg(f3)
    g2 = m.fp3(x2, x3, f2, f3)
    g1 = m.fp2(x1, x2, f1, g2)
    g0 = m.fp1(x0, x1, None, g1)
    return jnp.mean((x + m.head(g0)) ** 2)


def timed(name, **kw):
    def f(params):
        l, g = jax.value_and_grad(lambda p: run(p, **kw))(params)
        return l + 0.0 * gsum(g)

    t = measure(jax.jit(f), params, iters=5)
    print(f"{name:32s} {t*1e3:8.2f} ms")


timed("full")
timed("sg coords (x1,x2,x3)", sg_coords=True)
timed("sg feats (f1,f2,f3)", sg_feats=True)
timed("sg both", sg_coords=True, sg_feats=True)
