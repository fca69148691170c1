"""Integration: real training loops must learn (SURVEY.md §5 integration
tier). Tiny sizes — runs on the single-core CPU backend."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from pytorch_points_tpu.losses import ChamferLoss
from pytorch_points_tpu.models import PointNet2Classifier, PointUpsampler


def _make_two_classes(rng, b, n):
    """Spheres (label 0) vs cubes (label 1)."""
    half = b // 2
    sph = rng.standard_normal((half, n, 3)).astype(np.float32)
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    cub = rng.uniform(-1, 1, (b - half, n, 3)).astype(np.float32)
    x = np.concatenate([sph, cub])
    y = np.array([0] * half + [1] * (b - half), np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_classifier_learns_two_classes(rng):
    model = PointNet2Classifier(num_classes=2, rngs=nnx.Rngs(0))
    # shrink for CPU speed
    model.encoder.sa1.npoint = 32
    model.encoder.sa2.npoint = 8
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    x, y = _make_two_classes(rng, 8, 128)

    @jax.jit
    def step(params, opt):
        def loss_fn(params):
            logits = nnx.merge(graphdef, params)(x)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(40):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses
    logits = nnx.merge(graphdef, params)(x)
    acc = float(jnp.mean((jnp.argmax(logits, -1) == y)))
    assert acc >= 0.75, acc


def test_upsampler_learns_chamfer(rng):
    model = PointUpsampler(ratio=4, channels=8, growth_rate=8, dense_n=2,
                           k=8, rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    # targets: dense spheres; inputs: their FPS-ish subsets
    dense = rng.standard_normal((2, 256, 3)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=-1, keepdims=True)
    sparse = dense[:, ::4]
    dense, sparse = jnp.asarray(dense), jnp.asarray(sparse)
    cl = ChamferLoss()

    @jax.jit
    def step(params, opt):
        def loss_fn(params):
            up = nnx.merge(graphdef, params)(sparse)
            return cl(up, dense)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(15):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_ply_dataset_example_smoke(tmp_path, monkeypatch):
    """The on-disk-data example end-to-end at tiny scale: generate PLYs,
    bucket, train via Trainer, compute metrics (SURVEY.md §5 integration
    tier; examples/train_on_ply_dataset.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import train_on_ply_dataset as ex

    root = str(tmp_path / "ply")
    ex.make_dataset(root, count=20, seed=0)
    monkeypatch.setattr(
        sys, "argv", ["x", "--steps", "6", "--data", root, "--batch", "2"]
    )
    first, final, cl1, fs = ex.main()
    assert final < first
    assert np.isfinite(cl1) and 0.0 <= fs <= 1.0


def test_trainer_fit_prefetches_by_default(rng):
    """fit() must wrap a plain iterable in data.Prefetcher (overlap is the
    default, not opt-in — round-2 verdict item 8): the batch generator is
    consumed on a background thread, and prefetch=None opts out."""
    import threading

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from pytorch_points_tpu.models import PointCloudAutoencoder
    from pytorch_points_tpu.utils.trainer import Trainer

    model = PointCloudAutoencoder(npoint1=8, npoint2=4, rngs=nnx.Rngs(0))

    def loss_fn(m, batch):
        import pytorch_points_tpu as ppt

        return ppt.chamfer_distance(m(batch["points"]), batch["points"])

    pts = jnp.asarray(rng.standard_normal((8, 64, 3)), jnp.float32)
    threads = []

    def gen(k):
        for _ in range(k):
            threads.append(threading.current_thread())
            yield {"points": pts}

    tr = Trainer(model, optax.sgd(1e-3), loss_fn, log_every=10**9)
    tr.fit(gen(2), steps=2)
    assert threads and all(t is not threading.main_thread() for t in threads)

    threads.clear()
    tr.fit(gen(2), steps=4, prefetch=None)
    assert threads and all(t is threading.main_thread() for t in threads)


def test_file_io_examples_smoke(tmp_path, monkeypatch, rng):
    """upsample_cloud / render_cloud / export_and_serve examples run end
    to end at tiny scale (SURVEY.md §3.2 P10 example-surface tier).

    deform_with_cage is excluded: its 200-step convergence fit is covered
    by the dedicated cage tests."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import export_and_serve as ex_serve
    import render_cloud as ex_render
    import upsample_cloud as ex_up
    from pytorch_points_tpu.utils import pc_utils

    cloud = tmp_path / "in.ply"
    pc_utils.save_ply(
        rng.standard_normal((64, 3)).astype(np.float32), cloud
    )

    up_out = tmp_path / "up.ply"
    monkeypatch.setattr(sys, "argv", ["x", str(cloud), str(up_out)])
    ex_up.main()
    assert pc_utils.read_ply(up_out).shape == (256, 3)

    img_out = tmp_path / "img.png"
    monkeypatch.setattr(sys, "argv", ["x", str(cloud), str(img_out), "64"])
    ex_render.main()
    assert img_out.exists() or (tmp_path / "img.ppm").exists()

    monkeypatch.setattr(
        sys, "argv", ["x", "--steps", "2", "--n", "128", "--batch", "2"]
    )
    ex_serve.main()
