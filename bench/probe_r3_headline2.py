"""Round-3 close: per-component headline breakdown at B=32, N=16k.

Accounts every ms of the graded headline (FPS+group+Chamfer fwd+bwd) so
the remaining gap to the >=650 clouds/s target is attributed, not
guessed.  Every branch is grad-consumed the same way bench.py consumes
it (value_and_grad on the scalar loss), so no stage can be DCE'd.
"""
import numpy as np
import jax, jax.numpy as jnp

import pytorch_points_tpu as ppt
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.ops.grouping import group_points
from pytorch_points_tpu.ops.sampling import furthest_point_sample_and_gather
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, P = 32, 16384, 2048
gt = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
pred = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)) * 0.98 + 0.01, jnp.float32)


def t(name, f, *args):
    f = jax.jit(f)
    _ = jax.block_until_ready(f(*args))
    ms = measure(f, *args) * 1e3
    print(f"{name:<44s} {ms:8.2f} ms")
    return ms


# 1. chamfer alone, fwd and fwd+bwd
t("chamfer fwd", lambda p: ppt.chamfer_distance(p, gt), pred)
t("chamfer fwd+bwd",
  jax.value_and_grad(lambda p: ppt.chamfer_distance(p, gt)), pred)

# 2. FPS(+gather) fwd and fwd+bwd through the centroid coords
t("fps_and_gather fwd",
  lambda p: jax.tree.map(jnp.sum, furthest_point_sample_and_gather(p, P)[0]),
  pred)
t("fps_and_gather fwd+bwd",
  jax.value_and_grad(
      lambda p: jnp.sum(furthest_point_sample_and_gather(p, P)[0])),
  pred)

# 3. ball query on fixed centroids (no grad path through indices)
cen, _ = jax.jit(lambda p: furthest_point_sample_and_gather(p, P))(pred)
cen = jax.block_until_ready(cen)
t("ball_query fwd", lambda p, c: bqk.ball_query(p, c, 0.2, 32)[0], pred, cen)

# 4. group_points on fixed indices: fwd, then fwd+bwd (gather + scatter)
nidx = jax.block_until_ready(
    jax.jit(lambda p, c: bqk.ball_query(p, c, 0.2, 32)[0])(pred, cen))
t("group fwd (2.1M rows C=3)",
  lambda p: jnp.sum(group_points(p, nidx)), pred)
t("group fwd+bwd",
  jax.value_and_grad(lambda p: jnp.sum(group_points(p, nidx))), pred)

# 5. the group-pipeline reg term exactly as bench.py computes it
def reg_only(p):
    cenl, _ = furthest_point_sample_and_gather(p, P)
    nidxl, _ = bqk.ball_query(p, cenl, 0.2, 32)
    grouped = group_points(p, nidxl)
    centered = grouped - cenl[:, :, None, :]
    return jnp.mean(centered**2)

t("reg pipeline fwd+bwd (fps+bq+group+center)",
  jax.value_and_grad(reg_only), pred)

# 6. full headline
def headline(p):
    return ppt.chamfer_distance(p, gt) + 1e-6 * reg_only(p)

t("FULL headline fwd+bwd", jax.value_and_grad(headline), pred)
