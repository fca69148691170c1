"""Bisect the config-5 model's fwd+bwd time per layer (TPU)."""
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


def gsum(g):
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))


def timed(name, loss_fn, *args):
    def f(params, *a):
        l, g = jax.value_and_grad(loss_fn)(params, *a)
        return l + 0.0 * gsum(g)

    t = measure(jax.jit(f), params, *args, iters=5)
    print(f"{name:32s} {t*1e3:8.2f} ms")


# fabricate intermediates once (forward, sections don't need grads of inputs)
m0 = nnx.merge(graphdef, params)
(x0, x1, x2, x3), (_, f1, f2, f3) = m0.encoder(x)
g2 = m0.fp3(x2, x3, f2, f3)
g1 = m0.fp2(x1, x2, f1, g2)
g0 = m0.fp1(x0, x1, None, g1)
x1, x2, x3 = map(jax.lax.stop_gradient, (x1, x2, x3))
f1, f2, f3, g2, g1, g0 = map(jax.lax.stop_gradient, (f1, f2, f3, g2, g1, g0))

timed("sa1 (2048->512 ns32 3->128)", lambda p: jnp.mean(nnx.merge(graphdef, p).encoder.sa1(x, None)[1] ** 2))
timed("sa2 (512->128 ns32 128->256)", lambda p: jnp.mean(nnx.merge(graphdef, p).encoder.sa2(x1, f1)[1] ** 2))
timed("sa3 (global 256->1024)", lambda p: jnp.mean(nnx.merge(graphdef, p).encoder.sa3(x2, f2)[1] ** 2))
timed("fp3", lambda p: jnp.mean(nnx.merge(graphdef, p).fp3(x2, x3, f2, f3) ** 2))
timed("fp2", lambda p: jnp.mean(nnx.merge(graphdef, p).fp2(x1, x2, f1, g2) ** 2))
timed("fp1 (2048 pts)", lambda p: jnp.mean(nnx.merge(graphdef, p).fp1(x0, x1, None, g1) ** 2))
timed("head", lambda p: jnp.mean(nnx.merge(graphdef, p).head(g0) ** 2))
timed("encoder all", lambda p: jnp.mean(nnx.merge(graphdef, p).encoder(x)[1][3] ** 2))
timed("full model", lambda p: jnp.mean(nnx.merge(graphdef, p)(x) ** 2))
