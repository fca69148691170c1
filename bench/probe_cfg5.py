"""Round-2 probe: where does config5's ~100 ms go?

Times each component of the config-5 train step separately on the real
TPU.  Every variant returns a scalar that depends on ALL live outputs
(grads included) so XLA cannot DCE the backward pass.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import optax
from flax import nnx

import pytorch_points_tpu as ppt
from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
graphdef, params = nnx.split(model)
tx = optax.adam(1e-3)
opt_state = tx.init(params)
x5 = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)


def gsum(g):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))


def make(loss_fn):
    def f(params, xyz):
        l, g = jax.value_and_grad(loss_fn)(params, xyz)
        return l + 0.0 * gsum(g)

    return f


def loss_plain(params, xyz):
    m = nnx.merge(graphdef, params)
    return jnp.mean(m(xyz) ** 2)


def loss_cd(params, xyz):
    m = nnx.merge(graphdef, params)
    return ppt.chamfer_distance(m(xyz), xyz)


def loss_emd(params, xyz):
    m = nnx.merge(graphdef, params)
    emd, _ = ppt.earth_mover_distance(m(xyz), xyz)
    return jnp.mean(emd)


def loss_both(params, xyz):
    m = nnx.merge(graphdef, params)
    pred = m(xyz)
    cd = ppt.chamfer_distance(pred, xyz)
    emd, _ = ppt.earth_mover_distance(pred, xyz)
    return cd + 0.1 * jnp.mean(emd)


def full_step(params, opt_state, xyz):
    loss, grads = jax.value_and_grad(loss_both)(params, xyz)
    updates, opt_state2 = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state2, loss


pred = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)


def emd_alone(p, q):
    d, a = ppt.earth_mover_distance(p, q)
    return jnp.mean(d)


for name, f, args in [
    ("model fwd+bwd (mse)", make(loss_plain), (params, x5)),
    ("model+chamfer fwd+bwd", make(loss_cd), (params, x5)),
    ("model+emd fwd+bwd", make(loss_emd), (params, x5)),
    ("model+both fwd+bwd", make(loss_both), (params, x5)),
    ("full train_step (adam)", full_step, (params, opt_state, x5)),
    ("emd fwd alone B16 N2048 (30,2)", emd_alone, (pred, x5)),
]:
    t = measure(jax.jit(f), *args, iters=5)
    print(f"{name:36s} {t*1e3:8.2f} ms")
