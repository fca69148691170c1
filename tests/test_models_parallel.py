"""End-to-end model + multi-device tests (SURVEY.md §5 tiers 4-5) on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from pytorch_points_tpu import parallel
from pytorch_points_tpu.losses import ChamferLoss, EMDLoss, RepulsionLoss
from pytorch_points_tpu.models import (
    PointCloudAutoencoder,
    PointNet2Classifier,
    PointUpsampler,
)


def _need_devices(n):
    """SPMD tests are written for the virtual 8-device CPU mesh
    (conftest); on real hardware with fewer chips they skip — the
    multi-chip path is validated by the driver's dryrun_multichip."""
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices, have {jax.device_count()}")


def test_autoencoder_forward(rng):
    model = PointCloudAutoencoder(npoint1=64, npoint2=16, rngs=nnx.Rngs(0))
    xyz = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    pred = model(xyz)
    assert pred.shape == (2, 256, 3)
    assert bool(jnp.all(jnp.isfinite(pred)))


def test_classifier_forward(rng):
    model = PointNet2Classifier(num_classes=10, rngs=nnx.Rngs(0))
    xyz = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32)
    logits = model(xyz)
    assert logits.shape == (2, 10)


def test_upsampler_forward(rng):
    model = PointUpsampler(ratio=4, rngs=nnx.Rngs(0))
    xyz = jnp.asarray(rng.standard_normal((1, 128, 3)), jnp.float32)
    up = model(xyz)
    assert up.shape == (1, 512, 3)
    # upsampler loss combo runs
    loss = ChamferLoss(percentage=0.9)(up, xyz) + 0.1 * RepulsionLoss()(up)
    assert bool(jnp.isfinite(loss))


def test_data_parallel_train_step_runs_and_descends(rng):
    _need_devices(8)
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = parallel.make_mesh({"data": 8})
    model = PointCloudAutoencoder(npoint1=16, npoint2=8, rngs=nnx.Rngs(0))
    loss_fn = parallel.reconstruction_loss(emd_weight=0.0)
    step, state = parallel.make_train_step(
        model, optax.adam(1e-3), mesh, loss_fn
    )
    batch = {
        "points": jnp.asarray(rng.standard_normal((16, 64, 3)), jnp.float32)
    }
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_data_parallel_matches_single_device(rng):
    _need_devices(8)
    """Sharded-batch loss == single-device loss (SURVEY §5 tier 4)."""
    mesh = parallel.make_mesh({"data": 8})
    model = PointCloudAutoencoder(npoint1=16, npoint2=8, rngs=nnx.Rngs(0))
    loss_fn = parallel.reconstruction_loss(emd_weight=0.0)
    batch = {
        "points": jnp.asarray(rng.standard_normal((16, 64, 3)), jnp.float32)
    }
    step, state = parallel.make_train_step(
        model, optax.sgd(0.0), mesh, loss_fn, donate=False
    )
    _, loss_mc = step(state, batch)
    loss_1 = loss_fn(model, batch)
    np.testing.assert_allclose(float(loss_mc), float(loss_1), rtol=1e-5)


def test_chamfer_sharded_matches_dense(rng):
    _need_devices(8)
    from pytorch_points_tpu.ops import chamfer_distance

    mesh = parallel.make_mesh({"points": 8})
    p = jnp.asarray(rng.standard_normal((2, 96, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    got = parallel.chamfer_sharded(p, q, mesh)
    want = chamfer_distance(p, q)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_nndistance_sharded_indices(rng):
    _need_devices(8)
    import oracles
    from pytorch_points_tpu import parallel

    mesh = parallel.make_mesh({"points": 8})
    p = np.asarray(rng.standard_normal((2, 40, 3)), np.float32)
    q = np.asarray(rng.standard_normal((2, 64, 3)), np.float32)
    d1, i1, d2, i2 = parallel.nndistance_sharded(
        jnp.asarray(p), jnp.asarray(q), mesh
    )
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_array_equal(np.asarray(i2), oi2)
    np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-5)


def test_emd_loss_in_train_step(rng):
    """EMD participates in a jitted grad step (config 5 loss combo)."""
    model = PointCloudAutoencoder(npoint1=16, npoint2=8, rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(model)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    cl, el = ChamferLoss(), EMDLoss(max_iters=20, phases=1)

    @jax.jit
    def loss(params):
        m = nnx.merge(graphdef, params)
        pred = m(xyz)
        return cl(pred, xyz) + 0.1 * el(pred, xyz)

    l, g = jax.value_and_grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    assert bool(jnp.isfinite(l))


def test_train_step_remat_matches(rng):
    _need_devices(8)
    """remat=True must give identical losses (same math, less memory)."""
    mesh = parallel.make_mesh({"data": 8})
    model = PointCloudAutoencoder(npoint1=16, npoint2=8, rngs=nnx.Rngs(0))
    loss_fn = parallel.reconstruction_loss(emd_weight=0.0)
    batch = {
        "points": jnp.asarray(rng.standard_normal((8, 64, 3)), jnp.float32)
    }
    import optax as _optax

    s1, st1 = parallel.make_train_step(
        model, _optax.sgd(1e-2), mesh, loss_fn, donate=False
    )
    s2, st2 = parallel.make_train_step(
        model, _optax.sgd(1e-2), mesh, loss_fn, donate=False, remat=True
    )
    _, l1 = s1(st1, batch)
    new_state, l2 = s2(st2, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in jax.tree_util.tree_leaves(new_state.params)
    )


def test_nndistance_ring_matches_oracle(rng):
    _need_devices(8)
    """Fully-sharded ring pass == dense oracle, indices identical."""
    import oracles

    mesh = parallel.make_mesh({"points": 8})
    p = np.asarray(rng.standard_normal((2, 64, 3)), np.float32)
    q = np.asarray(rng.standard_normal((2, 96, 3)), np.float32)
    from pytorch_points_tpu.parallel.sharded_ops import nndistance_ring

    d1, i1, d2, i2 = nndistance_ring(jnp.asarray(p), jnp.asarray(q), mesh)
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_array_equal(np.asarray(i2), oi2)
    np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-5)


def test_nndistance_ring_ties(rng):
    _need_devices(8)
    """Shards visit out of order: duplicate points must still resolve to
    the lowest global index."""
    import oracles

    mesh = parallel.make_mesh({"points": 8})
    base = np.asarray(rng.standard_normal((1, 32, 3)), np.float32)
    q = np.concatenate([base, base], axis=1)  # [1, 64, 3] duplicated
    p = np.asarray(rng.standard_normal((1, 32, 3)), np.float32)
    from pytorch_points_tpu.parallel.sharded_ops import nndistance_ring

    _, i1, _, i2 = nndistance_ring(jnp.asarray(p), jnp.asarray(q), mesh)
    _, oi1, _, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_array_equal(np.asarray(i2), oi2)


def test_batchnorm_state_threads_through_train_step(rng):
    _need_devices(8)
    """norm='batch' blocks carry BatchStat; the SPMD step must update it."""
    from pytorch_points_tpu.layers import SharedMLP

    class Tiny(nnx.Module):
        def __init__(self, rngs):
            self.mlp = SharedMLP([3, 16, 3], norm="batch", act_last=False,
                                 rngs=rngs)

        def __call__(self, x):
            return self.mlp(x)

    mesh = parallel.make_mesh({"data": 8})
    model = Tiny(nnx.Rngs(0))

    def loss_fn(m, batch):
        pred = m(batch["points"])
        return jnp.mean((pred - batch["points"]) ** 2)

    step, state = parallel.make_train_step(
        model, optax.adam(1e-2), mesh, loss_fn, donate=False
    )
    stats0 = jax.tree_util.tree_leaves(state.rest)
    batch = {
        "points": jnp.asarray(rng.standard_normal((8, 32, 3)), jnp.float32)
    }
    state, loss = step(state, batch)
    stats1 = jax.tree_util.tree_leaves(state.rest)
    assert len(stats1) > 0, "batch norm should produce non-Param state"
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats0, stats1)
    )
    assert changed, "running statistics did not update"


def test_trainer_loop(rng, tmp_path):
    _need_devices(8)
    from pytorch_points_tpu.utils import Trainer

    model = PointCloudAutoencoder(npoint1=16, npoint2=8, rngs=nnx.Rngs(0))
    loss_fn = parallel.reconstruction_loss(emd_weight=0.0)
    trainer = Trainer(
        model, optax.adam(1e-3), loss_fn,
        mesh=parallel.make_mesh({"data": 8}),
        ckpt_dir=str(tmp_path / "ck"), log_every=2, ckpt_every=100,
    )
    pts = jnp.asarray(rng.standard_normal((16, 64, 3)), jnp.float32)
    batches = ({"points": pts} for _ in range(6))
    final = trainer.fit(batches)
    assert final is not None and np.isfinite(final)
    assert trainer.step == 6
    # checkpoint written at end; tolerant restore round-trips
    trainer.restore(step=6)


def test_profiling_trace(tmp_path, rng):
    from pytorch_points_tpu.utils import profiling

    x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    with profiling.trace(str(tmp_path / "tr")):
        from pytorch_points_tpu.ops import chamfer_distance

        float(chamfer_distance(x, x))
    import os

    found = any(
        f for _, _, fs in os.walk(tmp_path / "tr") for f in fs
    )
    assert found, "no trace files written"


def test_fps_sharded_index_identical(rng):
    """Point-sharded FPS == single-device FPS, indices exactly equal
    (the two-level argmax combine preserves the lowest-index tie rule)."""
    _need_devices(8)
    from pytorch_points_tpu.ops import furthest_point_sample

    mesh = parallel.make_mesh({"points": 8})
    xyz = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    got = parallel.furthest_point_sample_sharded(xyz, 16, mesh)
    want = furthest_point_sample(xyz, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # masked: invalid points never selected, still index-identical
    mask = np.ones((2, 128), bool)
    mask[:, 40:88] = False
    got_m = parallel.furthest_point_sample_sharded(
        xyz, 16, mesh, mask=jnp.asarray(mask)
    )
    want_m = furthest_point_sample(xyz, 16, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_ball_query_sharded_matches(rng):
    """Query-sharded ball query == replicated ball query exactly."""
    _need_devices(8)
    from pytorch_points_tpu.ops import ball_query

    mesh = parallel.make_mesh({"points": 8})
    xyz = jnp.asarray(rng.standard_normal((2, 96, 3)), jnp.float32)
    cen = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    gi, gc = parallel.ball_query_sharded(xyz, cen, 0.8, 8, mesh)
    wi, wc = ball_query(xyz, cen, 0.8, 8)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(wc))


def test_group_points_sharded_values_and_grads(rng):
    """Query-sharded grouping == replicated grouping, including the
    features gradient (per-device scatter partials must psum)."""
    _need_devices(8)
    from pytorch_points_tpu.ops.grouping import group_points

    feats = rng.standard_normal((2, 64, 5)).astype(np.float32)
    idx = rng.integers(0, 64, (2, 16, 4)).astype(np.int32)
    mesh = parallel.make_mesh({"points": 8})

    got = parallel.group_points_sharded(jnp.asarray(feats), jnp.asarray(idx),
                                        mesh)
    want = group_points(feats, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0)

    g_sharded = jax.grad(
        lambda f: jnp.sum(parallel.group_points_sharded(f, jnp.asarray(idx),
                                                        mesh) ** 2)
    )(jnp.asarray(feats))
    g_ref = jax.grad(lambda f: jnp.sum(group_points(f, idx) ** 2))(
        jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_three_nn_interpolate_sharded_matches(rng):
    """FP ops with the dense cloud sharded: values + feature grads equal
    the replicated path."""
    _need_devices(8)
    from pytorch_points_tpu.ops.interpolate import (
        three_interpolate, three_nn, interpolation_weights)

    unknown = rng.standard_normal((2, 32, 3)).astype(np.float32)
    known = rng.standard_normal((2, 12, 3)).astype(np.float32)
    feats = rng.standard_normal((2, 12, 6)).astype(np.float32)
    mesh = parallel.make_mesh({"points": 8})

    d_s, i_s = parallel.three_nn_sharded(jnp.asarray(unknown),
                                         jnp.asarray(known), mesh)
    d_r, i_r = three_nn(unknown, known)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))

    w = interpolation_weights(d_r)
    out_s = parallel.three_interpolate_sharded(
        jnp.asarray(feats), i_r, w, mesh
    )
    out_r = three_interpolate(feats, i_r, w)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)

    g_s = jax.grad(lambda f: jnp.sum(
        parallel.three_interpolate_sharded(f, i_r, w, mesh) ** 2
    ))(jnp.asarray(feats))
    g_r = jax.grad(lambda f: jnp.sum(three_interpolate(f, i_r, w) ** 2))(
        jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               rtol=1e-6, atol=1e-6)


def test_emd_sharded_matches_replicated(rng):
    """Object-sharded auction EMD == the replicated flat-eps XLA auction:
    the same assignment (bitwise), the same distances, and matched-pair
    gradients equal to the replicated op's."""
    _need_devices(8)
    from pytorch_points_tpu.ops import earth_mover_distance

    mesh = parallel.make_mesh({"points": 8})
    p = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)

    d_s, a_s = parallel.earth_mover_distance_sharded(
        p, q, mesh, eps=0.01, max_iters=45
    )
    # Replicated correctness path: flat eps, max_iters*phases budget.
    d_r, a_r = earth_mover_distance(
        p, q, eps=0.01, max_iters=45, phases=1, impl="xla"
    )
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-6)
    # Both clouds' gradients flow along the matched pairs only.
    gp_s, gq_s = jax.grad(
        lambda pp, qq: jnp.sum(
            parallel.earth_mover_distance_sharded(
                pp, qq, mesh, eps=0.01, max_iters=45
            )[0]
        ),
        argnums=(0, 1),
    )(p, q)
    gp_r, gq_r = jax.grad(
        lambda pp, qq: jnp.sum(
            earth_mover_distance(
                pp, qq, eps=0.01, max_iters=45, phases=1, impl="xla"
            )[0]
        ),
        argnums=(0, 1),
    )(p, q)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_r), rtol=1e-6)


def test_emd_sharded_masked(rng):
    """Masked sharded EMD matches the unmasked sharded EMD on the valid
    prefix (rank-matched pads pair with each other at distance 0) and
    zeroes masked outputs/grads."""
    _need_devices(8)
    mesh = parallel.make_mesh({"points": 8})
    n, nv = 64, 48
    p = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float32)
    mask = jnp.arange(n)[None, :] < nv
    mask = jnp.broadcast_to(mask, (2, n))

    d_m, a_m = parallel.earth_mover_distance_sharded(
        p, q, mesh, eps=0.01, max_iters=45, p_mask=mask, q_mask=mask
    )
    d_u, a_u = parallel.earth_mover_distance_sharded(
        p[:, :nv], q[:, :nv], mesh, eps=0.01, max_iters=45
    )
    np.testing.assert_array_equal(np.asarray(a_m[:, :nv]), np.asarray(a_u))
    np.testing.assert_allclose(np.asarray(d_m[:, :nv]), np.asarray(d_u),
                               rtol=1e-6)
    assert (np.asarray(d_m[:, nv:]) == 0).all()
    gp = jax.grad(
        lambda pp: jnp.sum(
            parallel.earth_mover_distance_sharded(
                pp, q, mesh, eps=0.01, max_iters=45, p_mask=mask,
                q_mask=mask
            )[0]
        )
    )(p)
    assert (np.asarray(gp)[:, nv:] == 0).all()
    assert np.isfinite(np.asarray(gp)).all()


def test_knn_sharded_matches(rng):
    """Query-sharded kNN == single-device kNN (dists and indices),
    masked and unmasked."""
    _need_devices(8)
    from pytorch_points_tpu.ops import knn

    mesh = parallel.make_mesh({"points": 8})
    q = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 96, 3)), jnp.float32)
    gd, gi = parallel.knn_sharded(q, s, 8, mesh)
    wd, wi = knn(q, s, 8)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    smask = np.ones((2, 96), bool)
    smask[:, 60:] = False
    gd, gi = parallel.knn_sharded(q, s, 8, mesh,
                                  support_mask=jnp.asarray(smask))
    wd, wi = knn(q, s, 8, support_mask=jnp.asarray(smask))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    assert (np.asarray(gi) < 60).all()


def test_sample_and_group_sharded_matches(rng):
    """The composed SPMD SA front-end == the single-device
    sample_and_group: indices bitwise, values equal, feature grads
    psum-merge to the replicated grads."""
    _need_devices(8)
    from pytorch_points_tpu.ops import sample_and_group

    mesh = parallel.make_mesh({"points": 8})
    xyz = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 128, 4)), jnp.float32)

    got = parallel.sample_and_group_sharded(
        xyz, feats, 16, 8, 0.8, mesh, normalize_radius=True
    )
    want = sample_and_group(xyz, feats, 16, 8, 0.8, normalize_radius=True)
    for g, w, name in zip(got, want, ("new_xyz", "feats", "idx", "grouped")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)

    # masked variant + feature gradient identity
    mask = np.ones((2, 128), bool)
    mask[:, 100:] = False
    mask = jnp.asarray(mask)

    def loss_sh(f):
        _, nf, _, _ = parallel.sample_and_group_sharded(
            xyz, f, 16, 8, 0.8, mesh, mask=mask
        )
        return jnp.sum(nf**2)

    def loss_rep(f):
        _, nf, _, _ = sample_and_group(xyz, f, 16, 8, 0.8, mask=mask)
        return jnp.sum(nf**2)

    g_sh = jax.grad(loss_sh)(feats)
    g_rep = jax.grad(loss_rep)(feats)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_rep),
                               rtol=1e-6, atol=1e-6)


def test_semseg_forward_and_training(rng):
    """PointNet2SemSeg: per-point logits, masked rows zeroed, and a few
    cross-entropy steps descend."""
    from pytorch_points_tpu.models import PointNet2SemSeg

    model = PointNet2SemSeg(num_classes=5, npoint1=32, npoint2=8,
                            rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    logits = model(x)
    assert logits.shape == (2, 128, 5)
    mask = jnp.broadcast_to(jnp.arange(128)[None, :] < 100, (2, 128))
    masked = model(x, mask=mask)
    assert (np.asarray(masked)[:, 100:] == 0).all()

    labels = jnp.asarray(rng.integers(0, 5, (2, 128)))
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(params):
            lg = nnx.merge(graphdef, params)(x)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(lg, labels)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_autoencoder_remat_grads_match(rng):
    """remat=True (per-SA/FP-stage jax.checkpoint) must change memory,
    not math: loss and grads equal the non-remat model bitwise."""
    x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)

    def grads(remat):
        model = PointCloudAutoencoder(npoint1=32, npoint2=8, remat=remat,
                                      rngs=nnx.Rngs(0))
        graphdef, params = nnx.split(model)

        @jax.jit
        def loss_fn(params):
            pred = nnx.merge(graphdef, params)(x)
            return jnp.mean((pred - x) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    (l0, g0), (l1, g1) = grads(False), grads(True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_autoencoder_bf16_mixed_precision(rng):
    """dtype=bfloat16 runs the MLP stack in bf16 (params stay f32, the
    residual add promotes predictions back to f32) and still trains."""
    model = PointCloudAutoencoder(
        npoint1=32, npoint2=8, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)
    )
    x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    pred = model(x)
    assert pred.dtype == jnp.float32  # promoted at the residual boundary
    assert np.isfinite(np.asarray(pred)).all()
    graphdef, params = nnx.split(model)
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree_util.tree_leaves(params)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    )

    logits = PointNet2Classifier(
        num_classes=4, dtype=jnp.bfloat16, rngs=nnx.Rngs(0)
    )(x)
    assert logits.dtype == jnp.bfloat16  # compute dtype flows to the head

    up = PointUpsampler(
        ratio=2, channels=8, growth_rate=8, dense_n=2, k=4,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )(x)
    assert up.dtype == jnp.float32  # parent + offsets promotes
    assert np.isfinite(np.asarray(up)).all()

    _need_devices(8)
    mesh = parallel.make_mesh({"data": 8})
    loss_fn = parallel.reconstruction_loss(emd_weight=0.0)
    step, state = parallel.make_train_step(
        model, optax.adam(1e-3), mesh, loss_fn, donate=False
    )
    batch = {"points": jnp.asarray(rng.standard_normal((8, 128, 3)),
                                   jnp.float32)}
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
