"""Morton-sorted bound-pruned NN kernel (kernels/nn_sorted.py).

The load-bearing invariant: the pruned worklist pass is BITWISE identical
to the dense fused kernel run on the sorted clouds — bounds may only skip
pairs that provably contain no nearest neighbor (ties included).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from pytorch_points_tpu.kernels import dispatch, distance_tiles, nn_sorted
from pytorch_points_tpu.ops import chamfer as chamfer_mod
from pytorch_points_tpu.ops import chamfer_distance


@pytest.fixture(autouse=True)
def _force_pallas():
    dispatch.force_impl("pallas")
    yield
    dispatch.force_impl(None)


def clouds(rng, b=2, n=600, m=700):
    p = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (b, m, 3)).astype(np.float32)
    return p, q


@pytest.mark.parametrize("n,m", [(512, 512), (600, 700), (1024, 300)])
def test_bitwise_equal_to_dense_on_sorted(rng, n, m):
    p, q = clouds(rng, 2, n, m)
    d1, i1, d2, i2, _, _ = nn_sorted.nndistance_sorted(p, q)
    ps, _ = nn_sorted.sort_by_morton(p)
    qs, _ = nn_sorted.sort_by_morton(q)
    dd1, di1, dd2, di2 = distance_tiles.nn_both_directions(ps, qs)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(dd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(di1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(dd2))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(di2))


def test_matches_oracle_in_original_space(rng):
    p, q = clouds(rng)
    b = p.shape[0]
    d1s, i1s, d2s, i2s, pp, pq = map(
        np.asarray, nn_sorted.nndistance_sorted(p, q)
    )
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    rows = np.arange(b)[:, None]
    d1 = np.zeros_like(od1)
    d1[rows, pp] = d1s
    i1 = np.zeros_like(oi1)
    i1[rows, pp] = pq[rows, i1s]
    np.testing.assert_allclose(d1, od1, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(i1, oi1)
    d2 = np.zeros_like(od2)
    d2[rows, pq] = d2s
    i2 = np.zeros_like(oi2)
    i2[rows, pq] = pp[rows, i2s]
    np.testing.assert_allclose(d2, od2, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(i2, oi2)


def test_budget_overflow_falls_back_to_dense(rng, monkeypatch):
    """With an absurdly small worklist budget the lax.cond dense branch
    must engage and still produce exact results."""
    monkeypatch.setattr(nn_sorted, "_BUDGET_FRAC", 0.01)
    p, q = clouds(rng, 1, 512, 512)
    d1, i1, d2, i2, _, _ = nn_sorted.nndistance_sorted(p, q)
    ps, _ = nn_sorted.sort_by_morton(p)
    qs, _ = nn_sorted.sort_by_morton(q)
    dd1, di1, _, _ = distance_tiles.nn_both_directions(ps, qs)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(dd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(di1))


def test_chamfer_sorted_path_value_and_grad(rng, monkeypatch):
    monkeypatch.setattr(chamfer_mod, "_SORTED_MIN_POINTS", 256)
    p, q = clouds(rng, 2, 600, 512)
    p = jnp.asarray(p)
    assert chamfer_mod._use_sorted_path(p, q, None, None, "auto")
    v_s, gp_s = jax.value_and_grad(lambda p: chamfer_distance(p, q))(p)
    gq_s = jax.grad(lambda q: chamfer_distance(p, q))(jnp.asarray(q))
    dispatch.force_impl("xla")
    v_d, gp_d = jax.value_and_grad(lambda p: chamfer_distance(p, q))(p)
    gq_d = jax.grad(lambda q: chamfer_distance(p, q))(jnp.asarray(q))
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_d), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_d), atol=1e-7)


def test_chamfer_small_or_masked_keeps_dense_path(rng):
    p, q = clouds(rng, 2, 600, 512)
    # below the size threshold
    assert not chamfer_mod._use_sorted_path(
        jnp.asarray(p), jnp.asarray(q), None, None, "auto"
    )
    # masked clouds skip the loss-only sorted path (_nndistance_sorted_d);
    # they ride the sorted_masked indexed path via nndistance instead
    mask = np.ones((2, 600), bool)
    chamfer_mod_min = chamfer_mod._SORTED_MIN_POINTS
    try:
        chamfer_mod._SORTED_MIN_POINTS = 256
        assert not chamfer_mod._use_sorted_path(
            jnp.asarray(p), jnp.asarray(q), mask, None, "auto"
        )
    finally:
        chamfer_mod._SORTED_MIN_POINTS = chamfer_mod_min


def test_sort_by_morton_is_permutation(rng):
    p, _ = clouds(rng, 3, 257, 8)
    ps, perm = nn_sorted.sort_by_morton(p)
    np.testing.assert_allclose(
        np.asarray(ps),
        np.take_along_axis(np.asarray(p), np.asarray(perm)[..., None], 1),
    )
    assert np.array_equal(
        np.sort(np.asarray(perm), axis=1),
        np.broadcast_to(np.arange(257), (3, 257)),
    )


@pytest.mark.skipif(
    os.environ.get("PPT_TEST_TPU") != "1",
    reason="hardware-scale exactness check (dense kernel at N=16k is too "
    "slow in interpret mode); runs in the PPT_TEST_TPU=1 suite",
)
def test_sorted_bitwise_vs_dense_at_bench_scale(rng):
    """Regression guard for the band-bound precision bug: Mosaic's default
    f32 dot (bf16x3) made bounds undershoot by ~2^-16*|q||p|, which only
    manifests at bench scale (1-3 missed candidates per 131k points)."""
    from pytorch_points_tpu.kernels.distance_tiles import nn_both_directions

    p = jnp.asarray(rng.uniform(-1, 1, (4, 16384, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (4, 16384, 3)), jnp.float32)
    ps, _ = nn_sorted.sort_by_morton(p)
    qs, _ = nn_sorted.sort_by_morton(q)
    dense = jax.jit(nn_both_directions)(ps, qs)
    pruned = jax.jit(nn_sorted.nndistance_presorted)(ps, qs)
    for a, b in zip(pruned, dense):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n,m", [(512, 512), (600, 700)])
def test_indexed_matches_dense_original_order(rng, n, m):
    """nndistance_indexed: original-order rows/indices, distances bitwise
    equal to the dense kernel on the ORIGINAL clouds."""
    p, q = clouds(rng, 2, n, m)
    d1, i1, d2, i2 = nn_sorted.nndistance_indexed(p, q)
    dd1, di1, dd2, di2 = distance_tiles.nn_both_directions(p, q)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(dd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(di1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(dd2))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(di2))


def test_indexed_tie_break_lowest_original_index(rng):
    """Exact ties must resolve to the lowest ORIGINAL index even though
    the kernel works in Morton-sorted space."""
    p, q = clouds(rng, 1, 512, 512)
    # plant exact duplicates in q at scattered indices; p point 0 sits
    # exactly on the duplicated coordinate -> multiple zero-distance ties
    dup = q[0, 403].copy()
    for j in (17, 85, 230, 311, 501):
        q[0, j] = dup
    p[0, 0] = dup
    d1, i1, d2, i2 = map(np.asarray, nn_sorted.nndistance_indexed(p, q))
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(i1, oi1)
    np.testing.assert_array_equal(i2, oi2)
    np.testing.assert_allclose(d1, od1, atol=1e-6)  # oracle sums in f64
    assert i1[0, 0] == 17  # lowest of the duplicate set


def test_indexed_overflow_falls_back_to_dense(rng, monkeypatch):
    monkeypatch.setattr(nn_sorted, "_BUDGET_FRAC", 0.01)
    p, q = clouds(rng, 1, 512, 512)
    d1, i1, d2, i2 = nn_sorted.nndistance_indexed(p, q)
    dd1, di1, dd2, di2 = distance_tiles.nn_both_directions(p, q)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(dd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(di1))


def test_nndistance_dispatches_sorted_with_grad(rng, monkeypatch):
    """Public nndistance at large N rides the indexed sorted path and its
    custom_vjp backward matches the dense path."""
    monkeypatch.setattr(chamfer_mod, "_SORTED_MIN_POINTS", 256)
    from pytorch_points_tpu.ops import nndistance

    p, q = clouds(rng, 2, 600, 512)
    p, q = jnp.asarray(p), jnp.asarray(q)

    def loss(p, q):
        d1, _, d2, _ = nndistance(p, q)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    v_s, (gp_s, gq_s) = jax.value_and_grad(loss, argnums=(0, 1))(p, q)
    dispatch.force_impl("xla")
    try:
        v_d, (gp_d, gq_d) = jax.value_and_grad(loss, argnums=(0, 1))(p, q)
    finally:
        dispatch.force_impl("pallas")
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_d), atol=1e-6)


@pytest.mark.parametrize("pfrac,qfrac", [(0.8, 0.5), (1.0, 0.3), (0.6, 1.0)])
def test_indexed_masked_bitwise_vs_dense_on_poisoned(rng, pfrac, qfrac):
    """Masked clouds through the pruned kernel: valid rows bitwise equal
    to the dense kernel on the same poisoned clouds."""
    from pytorch_points_tpu.core.masking import poison_points

    p, q = clouds(rng, 2, 512, 512)
    pm = np.arange(512)[None, :] < int(512 * pfrac)
    qm = np.arange(512)[None, :] < int(512 * qfrac)
    pm = np.broadcast_to(pm, (2, 512)).copy()
    qm = np.broadcast_to(qm, (2, 512)).copy()
    pp = poison_points(jnp.asarray(p), jnp.asarray(pm), sign=1.0)
    qp = poison_points(jnp.asarray(q), jnp.asarray(qm), sign=-1.0)
    d1, i1, d2, i2 = map(np.asarray, nn_sorted.nndistance_indexed_masked(pp, qp))
    dd1, di1, dd2, di2 = map(np.asarray, distance_tiles.nn_both_directions(pp, qp))
    np.testing.assert_array_equal(d1[pm], dd1[pm])
    np.testing.assert_array_equal(i1[pm], di1[pm])
    np.testing.assert_array_equal(d2[qm], dd2[qm])
    np.testing.assert_array_equal(i2[qm], di2[qm])


def test_nndistance_masked_dispatches_sorted(rng, monkeypatch):
    """Public masked nndistance at large N rides the sorted_masked path:
    values/indices/grads match the XLA path on the valid set."""
    monkeypatch.setattr(chamfer_mod, "_SORTED_MIN_POINTS", 256)
    from pytorch_points_tpu.ops import nndistance

    p, q = clouds(rng, 2, 600, 512)
    pm = np.ones((2, 600), bool)
    pm[:, 450:] = False
    qm = np.ones((2, 512), bool)
    qm[0, 300:] = False
    p, q = jnp.asarray(p), jnp.asarray(q)
    pm_j, qm_j = jnp.asarray(pm), jnp.asarray(qm)

    def loss(p, q):
        d1, _, d2, _ = nndistance(p, q, pm_j, qm_j)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    d1, i1, d2, i2 = map(np.asarray, nndistance(p, q, pm_j, qm_j))
    v_s, (gp_s, gq_s) = jax.value_and_grad(loss, argnums=(0, 1))(p, q)
    dispatch.force_impl("xla")
    try:
        od1, oi1, od2, oi2 = map(np.asarray, nndistance(p, q, pm_j, qm_j))
        v_d, (gp_d, gq_d) = jax.value_and_grad(loss, argnums=(0, 1))(p, q)
    finally:
        dispatch.force_impl("pallas")
    np.testing.assert_allclose(d1, od1, atol=1e-6)
    np.testing.assert_array_equal(i1, oi1)
    np.testing.assert_allclose(d2, od2, atol=1e-6)
    np.testing.assert_array_equal(i2, oi2)
    # masked rows are exactly (0, 0)
    assert np.all(d1[~pm] == 0) and np.all(i1[~pm] == 0)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_d), atol=1e-6)
    # padded points receive zero gradient
    assert np.all(np.asarray(gp_s)[~pm] == 0)


def test_indexed_masked_all_valid_matches_unmasked(rng):
    p, q = clouds(rng, 2, 512, 512)
    r_m = nn_sorted.nndistance_indexed_masked(p, q)
    r_u = nn_sorted.nndistance_indexed(p, q)
    for a, b in zip(r_m, r_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chamfer_path_markers(rng):
    """Telemetry markers flip with shape, masks and force_impl."""
    from pytorch_points_tpu.ops.chamfer import chamfer_path

    small_p = jnp.zeros((1, 256, 3))
    big_p = jnp.zeros((1, 8192, 3))
    mask = jnp.ones((1, 8192), bool)
    assert chamfer_path(big_p, big_p) == "sorted"
    assert chamfer_path(big_p, big_p, mask) == "sorted_masked"
    assert chamfer_path(small_p, small_p) == "dense-pallas"
    dispatch.force_impl("xla")
    try:
        assert chamfer_path(big_p, big_p) == "xla"
    finally:
        dispatch.force_impl("pallas")


def test_compact_pairs_packed_key_order(rng):
    """The packed-key compaction keeps candidates in exact flat i-major
    order with zero padding beyond count (the kernel's tie-break and the
    unrolled idempotent-padding contract both depend on this)."""
    import numpy as np

    from pytorch_points_tpu.kernels.nn_sorted import _compact_pairs

    cand = rng.random((3, 4, 8)) < 0.3
    pairs, count = map(np.asarray, _compact_pairs(jnp.asarray(cand), 20))
    for b in range(3):
        want = np.flatnonzero(cand[b].reshape(-1))
        assert count[b] == len(want)
        np.testing.assert_array_equal(pairs[b, : count[b]], want)
        assert (pairs[b, count[b]:] == 0).all()
