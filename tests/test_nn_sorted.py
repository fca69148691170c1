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
    # masked clouds never take the sorted path
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
