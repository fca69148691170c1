"""Drive the library through its public surface: a user's mini workflow.

FPS-downsample a cloud, group neighborhoods, compute chamfer+EMD losses,
and take a gradient step on a predicted cloud — the canonical use of the
reference library (SURVEY.md §4).
"""
import numpy as np
import jax, jax.numpy as jnp

import pytorch_points_tpu as ppt

print("backend:", jax.default_backend())
rng = np.random.default_rng(42)
gt = rng.standard_normal((4, 1024, 3)).astype(np.float32)
pred = gt + 0.1 * rng.standard_normal((4, 1024, 3)).astype(np.float32)

# 1. sample + group (SA front half)
new_xyz, new_feats, idx, grouped = ppt.sample_and_group(
    gt, None, npoint=256, nsample=32, radius=0.2)
print("sample_and_group:", new_xyz.shape, new_feats.shape, idx.shape)

# 2. chamfer + EMD loss and one SGD step on pred
@jax.jit
def loss_fn(pred):
    cd = ppt.chamfer_distance(pred, gt)
    emd_d, _ = ppt.earth_mover_distance(pred, gt, eps=0.02, max_iters=50)
    return cd + 0.1 * jnp.mean(emd_d)

p = jnp.asarray(pred)
l0 = float(loss_fn(p))
for _ in range(20):
    _, g = jax.value_and_grad(loss_fn)(p)
    p = p - 2.0 * g
l1 = float(loss_fn(p))
print(f"loss before={l0:.5f} after 20 SGD steps={l1:.5f}")
assert l1 < 0.98 * l0, "SGD did not reduce the loss"

# 3. normals + normalization utilities
normals = ppt.batch_normals(gt[:1], k=16)
print("normals:", normals.shape, "unit-norm:",
      bool(jnp.allclose(jnp.linalg.norm(normals, axis=-1), 1.0, atol=1e-3)))
norm_pc, centroid, rad = ppt.normalize_point_batch(gt)
print("normalize:", norm_pc.shape, float(jnp.abs(jnp.linalg.norm(norm_pc, axis=-1).max(-1) - 1).max()))
print("OK")
