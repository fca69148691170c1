"""Round-4: where does the headline's 'centering reg + residual
elementwise ~4-5 ms' actually go?  Decompose the reg pipeline
(fps+bq+group+center) into its stages and the deltas between them.
"""
import numpy as np
import jax, jax.numpy as jnp

import pytorch_points_tpu as ppt
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.ops.grouping import group_points
from pytorch_points_tpu.ops.sampling import furthest_point_sample_and_gather
from pytorch_points_tpu.utils.benchmark import measure

import os
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
B, N, P = 32, 16384, 2048
pred = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)) * 0.98 + 0.01, jnp.float32)


def t(name, f, *args):
    f = jax.jit(f)
    ms = measure(f, *args) * 1e3
    print(f"{name:<52s} {ms:8.2f} ms")
    return ms


# stage chain, each one step further, all grad-consumed
def s1(p):  # fps+gather only
    cen, _ = furthest_point_sample_and_gather(p, P)
    return jnp.sum(cen)

def s2(p):  # + ball query (indices not differentiable)
    cen, _ = furthest_point_sample_and_gather(p, P)
    nidx, _ = bqk.ball_query(p, cen, 0.2, 32)
    return jnp.sum(cen) + 1e-12 * jnp.sum(nidx.astype(jnp.float32))

def s3(p):  # + group (gather fwd + scatter bwd)
    cen, _ = furthest_point_sample_and_gather(p, P)
    nidx, _ = bqk.ball_query(p, cen, 0.2, 32)
    grouped = group_points(p, nidx)
    return jnp.sum(cen) + jnp.sum(grouped)

def s4(p):  # + centering, sum (no square)
    cen, _ = furthest_point_sample_and_gather(p, P)
    nidx, _ = bqk.ball_query(p, cen, 0.2, 32)
    grouped = group_points(p, nidx)
    centered = grouped - cen[:, :, None, :]
    return jnp.sum(centered)

def s5(p):  # + square + mean (the bench reg term)
    cen, _ = furthest_point_sample_and_gather(p, P)
    nidx, _ = bqk.ball_query(p, cen, 0.2, 32)
    grouped = group_points(p, nidx)
    centered = grouped - cen[:, :, None, :]
    return jnp.mean(centered**2)

a = t("fps+gather fwd+bwd", jax.value_and_grad(s1), pred)
b = t("+ ball_query", jax.value_and_grad(s2), pred)
c = t("+ group", jax.value_and_grad(s3), pred)
d = t("+ centering(sum)", jax.value_and_grad(s4), pred)
e = t("+ square+mean (full reg)", jax.value_and_grad(s5), pred)
print(f"deltas: bq {b-a:.2f}  group {c-b:.2f}  center {d-c:.2f}  sqmean {e-d:.2f}")
