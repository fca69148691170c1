"""Headline decomposition + wide-C gather ground truth."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

import pytorch_points_tpu as ppt
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.kernels import fps as fpsk
from pytorch_points_tpu.ops.grouping import group_points
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, P = 32, 16384, 2048
gt = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
pred = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)) * 0.98, jnp.float32)

idx_fps = jax.jit(lambda x: fpsk.furthest_point_sample(x, P))(pred)
cen = gather_points(pred, idx_fps)
nidx, _ = jax.jit(lambda a, b: bqk.ball_query(a, b, 0.2, 32))(pred, cen)

def t(name, f, *args):
    v = measure(jax.jit(f), *args, iters=5)
    print(f"{name:44s} {v*1e3:8.2f} ms", flush=True)

t("fps B32", lambda x: fpsk.furthest_point_sample(x, P), pred)
t("ball_query B32", lambda a, b: bqk.ball_query(a, b, 0.2, 32)[0], pred, cen)
t("group fwd (2M rows C=3)", lambda f, i: group_points(f, i), pred, nidx)
t("group fwd+bwd", lambda f, i: jax.value_and_grad(
    lambda f: jnp.sum(group_points(f, i) ** 2))(f)[1].sum(), pred, nidx)
t("chamfer fwd", lambda p, q: ppt.chamfer_distance(p, q), pred, gt)
t("chamfer fwd+bwd", lambda p, q: jax.value_and_grad(
    lambda p: ppt.chamfer_distance(p, q))(p)[1].sum(), pred, gt)

# wide-C gather ground truth: XLA take_along_axis at C in {16, 64, 128}
for C in (16, 64, 128):
    feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    flat = nidx.reshape(B, -1)

    def xla_gather(f, i=flat):
        return jnp.take_along_axis(f, i[..., None], axis=1)

    t(f"XLA gather 2M rows C={C}", xla_gather, feat)
