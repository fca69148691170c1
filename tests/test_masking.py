"""Consolidated padding/masking invariants (SURVEY.md §5 tier 3).

The two framework-wide invariants promised by core/masking.py:

  1. a padded (invalid) point never wins an argmin / argmax / top-k and
     is never returned as a neighbor index;
  2. a padded point receives zero gradient, and padded entries never
     change the loss value.

Each test compares op(cloud of n points) with op(cloud padded to n+pad
with garbage coordinates + mask) — results must match exactly on the
valid region and gradients must vanish on the padding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_points_tpu as ppt
from pytorch_points_tpu.losses import ChamferLoss, RepulsionLoss, UniformLoss
from pytorch_points_tpu.ops import ball_query, furthest_point_sample, knn
from pytorch_points_tpu.ops.sampling import gather_points


def padded(rng, cloud, pad):
    """Append `pad` garbage points and build the validity mask."""
    b, n, c = cloud.shape
    junk = jnp.asarray(rng.uniform(-50, 50, (b, pad, c)), jnp.float32)
    big = jnp.concatenate([cloud, junk], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((b, n), bool), jnp.zeros((b, pad), bool)], axis=1
    )
    return big, mask


@pytest.fixture
def cloud(rng):
    return jnp.asarray(rng.uniform(-1, 1, (2, 24, 3)), jnp.float32)


def test_fps_ignores_padding(rng, cloud):
    big, mask = padded(rng, cloud, 9)
    idx_ref = furthest_point_sample(cloud, 8)
    idx_pad = furthest_point_sample(big, 8, mask=mask)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_pad))
    assert np.asarray(idx_pad).max() < cloud.shape[1]


def test_knn_ignores_padding(rng, cloud):
    q = jnp.asarray(rng.uniform(-1, 1, (2, 5, 3)), jnp.float32)
    big, mask = padded(rng, cloud, 9)
    d_ref, i_ref = knn(q, cloud, 4)
    d_pad, i_pad = knn(q, big, 4, support_mask=mask)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pad))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pad), rtol=1e-6)


def test_ball_query_ignores_padding(rng, cloud):
    q = jnp.asarray(rng.uniform(-1, 1, (2, 5, 3)), jnp.float32)
    # garbage points inside the ball radius would corrupt hits if unmasked
    big, mask = padded(rng, cloud, 9)
    big = big.at[:, 24:, :].set(q[:, :1, :] + 0.01)  # adversarial padding
    i_ref, c_ref = ball_query(cloud, q, 0.5, 6)
    i_pad, c_pad = ball_query(big, q, 0.5, 6, mask=mask)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pad))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pad))


def test_chamfer_value_and_zero_grad_on_padding(rng, cloud):
    gt = jnp.asarray(rng.uniform(-1, 1, (2, 17, 3)), jnp.float32)
    big, mask = padded(rng, cloud, 9)

    ref = ppt.chamfer_distance(cloud, gt)
    val, grad = jax.value_and_grad(
        lambda p: ppt.chamfer_distance(p, gt, p_mask=mask)
    )(big)
    np.testing.assert_allclose(float(ref), float(val), rtol=1e-6)
    g_pad = np.asarray(grad)[:, 24:, :]
    np.testing.assert_array_equal(g_pad, np.zeros_like(g_pad))


def test_chamfer_loss_trimmed_masked(rng, cloud):
    gt = jnp.asarray(rng.uniform(-1, 1, (2, 17, 3)), jnp.float32)
    big, mask = padded(rng, cloud, 9)
    loss = ChamferLoss(percentage=0.5)
    ref = loss(cloud, gt)
    val = loss(big, gt, pred_mask=mask)
    np.testing.assert_allclose(float(ref), float(val), rtol=1e-6)


def test_repulsion_and_uniform_losses_masked(rng, cloud):
    big, mask = padded(rng, cloud, 9)
    rep = RepulsionLoss(k=3, h=0.5)
    # padded rows contribute zeros; compare against explicit rescale
    ref = float(rep(cloud)) * (24 * 3) / ((24 + 9) * 3)
    val = float(rep(big, mask=mask))
    np.testing.assert_allclose(ref, val, rtol=1e-5)

    uni = UniformLoss(npoint=8, radii=(0.02, 0.05))
    ref_u = float(uni(cloud))
    val_u = float(uni(big, mask=mask))
    np.testing.assert_allclose(ref_u, val_u, rtol=1e-5)


def test_gather_grad_zero_outside_selection(rng, cloud):
    idx = jnp.asarray(rng.integers(0, 10, (2, 6)), jnp.int32)

    def f(x):
        return jnp.sum(gather_points(x, idx) ** 2)

    g = np.asarray(jax.grad(f)(cloud))
    touched = np.zeros((2, 24), bool)
    for b in range(2):
        touched[b, np.asarray(idx)[b]] = True
    assert (g[~touched] == 0).all()


def test_emd_pads_match_pads(rng):
    """EMD on padded clouds: the wrapper pads persons/objects with paired
    far-away twins, so real points never match padding."""
    p = jnp.asarray(rng.uniform(-1, 1, (2, 24, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 24, 3)), jnp.float32)
    d, assign = ppt.earth_mover_distance(p, q, eps=0.01, max_iters=100)
    a = np.asarray(assign)
    assert (np.sort(a, axis=1) == np.arange(24)).all()  # permutation
    assert np.asarray(d).max() < 16.0  # never matched to a pad twin


def test_emd_masked_equals_valid_prefix(rng):
    """Masked EMD (round-3 API): invalid slots rank-match each other at
    distance 0, so the valid assignment and cost match running EMD on the
    valid prefixes alone; masked outputs are (0, 0) and masked points get
    zero gradient."""
    B, N, V = 2, 32, 20
    p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    # scattered (non-prefix) masks with equal valid counts
    pm = np.zeros((B, N), bool)
    qm = np.zeros((B, N), bool)
    prng = np.random.default_rng(3)
    for b in range(B):
        pm[b, prng.choice(N, V, replace=False)] = True
        qm[b, prng.choice(N, V, replace=False)] = True
    pmj, qmj = jnp.asarray(pm), jnp.asarray(qm)

    d, a = ppt.earth_mover_distance(p, q, eps=0.002, max_iters=200,
                                    p_mask=pmj, q_mask=qmj)
    d, a = np.asarray(d), np.asarray(a)
    # masked outputs are exactly (0, 0)
    assert (d[~pm] == 0).all() and (a[~pm] == 0).all()
    # valid persons match valid objects, bijectively
    for b in range(B):
        va = a[b][pm[b]]
        assert qm[b][va].all()
        assert len(set(va.tolist())) == V
    # cost matches EMD on the compacted valid prefixes (same point sets)
    pc = np.stack([np.asarray(p)[b][pm[b]] for b in range(B)])
    qc = np.stack([np.asarray(q)[b][qm[b]] for b in range(B)])
    dv, _ = ppt.earth_mover_distance(jnp.asarray(pc), jnp.asarray(qc),
                                     eps=0.002, max_iters=200)
    got = d.sum(1) / V
    want = np.asarray(dv).mean(1)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=1e-3)

    # gradient: masked points receive exactly zero
    from pytorch_points_tpu.losses import EMDLoss

    gfn = jax.grad(lambda p: EMDLoss(eps=0.002, max_iters=200)(
        p, q, pred_mask=pmj, gt_mask=qmj))
    gp = np.asarray(gfn(p))
    assert (gp[~pm] == 0).all()
    assert np.abs(gp[pm]).max() > 0
