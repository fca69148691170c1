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
# single-core CPU backend is slow: scale the drive down off-TPU
_big = jax.default_backend() == "tpu"
_N = 1024 if _big else 256
_STEPS = 20 if _big else 5
gt = rng.standard_normal((4, _N, 3)).astype(np.float32)
pred = gt + 0.1 * rng.standard_normal((4, _N, 3)).astype(np.float32)

# 1. sample + group (SA front half)
new_xyz, new_feats, idx, grouped = ppt.sample_and_group(
    gt, None, npoint=_N // 4, nsample=32, radius=0.2)
print("sample_and_group:", new_xyz.shape, new_feats.shape, idx.shape)

# 2. chamfer + EMD loss and one SGD step on pred
@jax.jit
def loss_fn(pred):
    cd = ppt.chamfer_distance(pred, gt)
    emd_d, _ = ppt.earth_mover_distance(pred, gt, eps=0.02, max_iters=50)
    return cd + 0.1 * jnp.mean(emd_d)

p = jnp.asarray(pred)
l0 = float(loss_fn(p))
for _ in range(_STEPS):
    _, g = jax.value_and_grad(loss_fn)(p)
    p = p - 2.0 * g
l1 = float(loss_fn(p))
print(f"loss before={l0:.5f} after {_STEPS} SGD steps={l1:.5f}")
assert l1 < 0.98 * l0, "SGD did not reduce the loss"

# 3. normals + normalization utilities
normals = ppt.batch_normals(gt[:1], k=16)
print("normals:", normals.shape, "unit-norm:",
      bool(jnp.allclose(jnp.linalg.norm(normals, axis=-1), 1.0, atol=1e-3)))
norm_pc, centroid, rad = ppt.normalize_point_batch(gt)
print("normalize:", norm_pc.shape, float(jnp.abs(jnp.linalg.norm(norm_pc, axis=-1).max(-1) - 1).max()))
print("OK")

# 4. model + data pipeline + checkpoint roundtrip (new surface)
import optax
from flax import nnx
from pytorch_points_tpu.data import BucketedBatcher, random_clouds
from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils import load_network, save_network

ds = random_clouds(8, lo=200, hi=500, seed=0)
batcher = BucketedBatcher(ds, batch_size=4, multiple=128, max_buckets=2)
model = PointCloudAutoencoder(npoint1=32, npoint2=8, rngs=nnx.Rngs(0))
graphdef, params = nnx.split(model)
tx = optax.adam(1e-3)
opt = tx.init(params)

@jax.jit
def train_step(params, opt, pts, mask):
    def loss_fn(params):
        m = nnx.merge(graphdef, params)
        return ppt.chamfer_distance(m(pts, mask=mask), pts, p_mask=mask, q_mask=mask)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    upd, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, upd), opt, loss

seen = 0
for batch in batcher:
    params, opt, loss = train_step(
        params, opt, jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]))
    seen += 1
print(f"trained on {seen} bucketed batches, final loss {float(loss):.5f}")
assert jnp.isfinite(loss)

import tempfile
ckdir = tempfile.mkdtemp()
save_network(params, ckdir, step=1)
restored, _ = load_network(params, ckdir, step=1)
print("checkpoint roundtrip ok")

# 4b. round-3 surface: large-N nndistance rides the Morton-pruned indexed
# kernel (unmasked AND masked) — verify against the dense/XLA contract.
if _big:
    from pytorch_points_tpu.core.masking import poison_points
    from pytorch_points_tpu.kernels.distance_tiles import nn_both_directions
    from pytorch_points_tpu.ops import nndistance
    from pytorch_points_tpu.ops.chamfer import chamfer_path

    # The exactness contract is bitwise vs the dense diff^2 kernel (the
    # XLA matmul-form path picks different winners on f32-level near-ties
    # at this scale, so indices are only comparable within one arithmetic).
    pL = jnp.asarray(rng.uniform(-1, 1, (2, 8192, 3)), jnp.float32)
    qL = jnp.asarray(rng.uniform(-1, 1, (2, 8192, 3)), jnp.float32)
    assert chamfer_path(pL, qL) == "sorted", chamfer_path(pL, qL)
    d1, i1, d2, i2 = nndistance(pL, qL)
    rd1, ri1, rd2, ri2 = nn_both_directions(pL, qL)
    assert np.array_equal(np.asarray(i1), np.asarray(ri1))
    assert np.array_equal(np.asarray(d1), np.asarray(rd1))
    mL = jnp.asarray(np.arange(8192)[None, :] < 6000).repeat(2, 0)
    assert chamfer_path(pL, qL, mL) == "sorted_masked"
    md1, mi1, _, _ = nndistance(pL, qL, mL, mL)
    dd = nn_both_directions(poison_points(pL, mL, 1.0),
                            poison_points(qL, mL, -1.0))
    mnp = np.asarray(mL)
    assert np.array_equal(np.asarray(mi1)[mnp], np.asarray(dd[1])[mnp])
    assert np.array_equal(np.asarray(md1)[mnp], np.asarray(dd[0])[mnp])
    print("sorted nndistance (unmasked+masked) bitwise vs dense at N=8192 ok")

    # 4b3. round-4 surface: large unmasked kNN rides the Morton-ring
    # kernel — bitwise against the in-order streaming kernel.
    from pytorch_points_tpu.kernels import topk_scan
    from pytorch_points_tpu.ops import knn as knn_op
    from pytorch_points_tpu.ops.grouping import knn_path

    assert knn_path(pL, pL, 16) == "ring", knn_path(pL, pL, 16)
    kd, ki = knn_op(pL, pL, 16)
    sd, si = topk_scan.knn(pL, pL, 16, sorted_ok=False)
    assert np.array_equal(np.asarray(ki), np.asarray(si))
    assert np.array_equal(np.asarray(kd), np.asarray(sd))
    print("ring kNN bitwise vs streaming kernel at N=8192 ok")

    # 4b4. round-5 surface: MASKED supports ride the ring kernel too
    # (valid-AABB Morton sort, poison-last, scalar-prefetched centers).
    assert knn_path(pL, pL, 16, support_mask=mL) == "ring_masked"
    mkd, mki = knn_op(pL, pL, 16, support_mask=mL)
    msd, msi = topk_scan.knn(pL, poison_points(pL, mL, -1.0), 16,
                             sorted_ok=False)
    assert np.array_equal(np.asarray(mki), np.asarray(msi))
    assert np.array_equal(np.asarray(mkd), np.asarray(msd))
    assert int(np.asarray(mki).max()) < 6000  # no poisoned row returned
    print("masked ring kNN bitwise vs streaming kernel at N=8192 ok")

# 4b2. round-3 surface: keyed on-device augmentation inside jit.
from pytorch_points_tpu.data import augment

ka = jax.random.PRNGKey(0)
xa = jnp.asarray(gt[:2, :128])
aug = jax.jit(lambda k, x: augment.rotate(
    k, augment.jitter(jax.random.split(k)[0], x)))(ka, xa)
assert aug.shape == xa.shape and bool(jnp.isfinite(aug).all())
vx = jax.jit(lambda x: ppt.voxel_downsample_mask(x, 0.3))(xa)
assert bool(vx.any()) and vx.shape == xa.shape[:2]
print("on-device augmentation + voxel downsample ok")

# 4c. round-3 surface: semantic segmentation head + bf16 policy — one
# cross-entropy step on per-point logits, mixed-precision forward.
from pytorch_points_tpu.models import PointNet2SemSeg

seg = PointNet2SemSeg(num_classes=6, npoint1=32, npoint2=8,
                      rngs=nnx.Rngs(1))
seg_logits = jax.jit(seg)(jnp.asarray(gt[:2, :128]))
assert seg_logits.shape == (2, 128, 6)
ae16 = PointCloudAutoencoder(npoint1=32, npoint2=8, dtype=jnp.bfloat16,
                             rngs=nnx.Rngs(0))
p16 = jax.jit(ae16)(jnp.asarray(gt[:2, :128]))
assert p16.dtype == jnp.float32 and bool(jnp.isfinite(p16).all())
print("semseg logits + bf16 policy ok")

# 5. group_knn unique semantics + binary mesh I/O (round-2 surface)
import os

from pytorch_points_tpu.ops import group_knn
from pytorch_points_tpu.utils import geometry_utils

q5 = np.asarray(rng.standard_normal((1, 4, 3)), np.float32)
s5 = np.asarray(rng.standard_normal((1, 16, 3)), np.float32)
s5[0, 5] = s5[0, 2]  # exact duplicate
_, idx5, _ = group_knn(4, jnp.asarray(q5), jnp.asarray(s5), unique=True)
assert not ((np.asarray(idx5) == 2).any(-1) & (np.asarray(idx5) == 5).any(-1)).any()
verts5, faces5 = geometry_utils.generate_icosphere(1)
with tempfile.TemporaryDirectory() as td:
    mp = os.path.join(td, "m.ply")
    geometry_utils.write_mesh(mp, verts5, faces5)
    v5r, f5r = geometry_utils.read_mesh(mp)
    assert np.allclose(v5r, verts5, atol=1e-5) and (f5r == faces5).all()
print("group_knn unique + mesh io ok")
print("DRIVE OK")
