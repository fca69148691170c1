"""Pallas kernel vs oracle equivalence (SURVEY.md §5 tier 2).

Runs in interpret mode on the CPU backend; the same tests execute compiled
on real hardware via PPT_TEST_TPU=1.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from pytorch_points_tpu import kernels
from pytorch_points_tpu.kernels import distance_tiles


def test_available_kernels_import():
    for name in kernels.AVAILABLE:
        assert name in {
            "chamfer", "fps", "knn", "ball_query", "emd", "group", "scatter", "gather",
        }


@pytest.mark.parametrize(
    "b,n,m",
    [(1, 8, 8), (2, 150, 77), (1, 129, 257), (3, 64, 300)],
)
def test_nn_one_direction_matches_oracle(rng, b, n, m):
    p = rng.standard_normal((b, n, 3), dtype=np.float32)
    q = rng.standard_normal((b, m, 3), dtype=np.float32)
    d, i = distance_tiles.nn_one_direction(p, q)
    od, oi, _, _ = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(d), od, atol=1e-6, rtol=1e-6)


def test_nn_tie_break_lowest_index(rng):
    """Duplicate support points: argmin must pick the lowest index, even
    across chunk boundaries."""
    p = rng.standard_normal((1, 16, 3), dtype=np.float32)
    base = rng.standard_normal((1, 8, 3), dtype=np.float32)
    # q = three copies of the same 8 points -> every argmin has 3-way ties
    q = np.concatenate([base, base, base], axis=1)
    d, i = distance_tiles.nn_one_direction(p, q, tn=128, tm=8)
    assert np.all(np.asarray(i) < 8), np.asarray(i)
    od, oi, _, _ = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_nn_grad_through_public_op(rng):
    """Backward through the pallas forward (indices saved by custom_vjp)."""
    from pytorch_points_tpu.kernels import dispatch
    from pytorch_points_tpu.ops import chamfer_distance

    p = rng.standard_normal((1, 40, 3), dtype=np.float32)
    q = rng.standard_normal((1, 30, 3), dtype=np.float32)
    g_pallas = jax.grad(lambda p: chamfer_distance(p, q, impl="pallas"))(
        jax.numpy.asarray(p)
    )
    g_xla = jax.grad(lambda p: chamfer_distance(p, q, impl="xla"))(
        jax.numpy.asarray(p)
    )
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("b,n,k", [(1, 128, 16), (3, 200, 32), (2, 300, 64)])
def test_fps_kernel_matches_oracle(rng, b, n, k):
    from pytorch_points_tpu.kernels import fps as fpsk

    xyz = rng.standard_normal((b, n, 3), dtype=np.float32)
    idx = fpsk.furthest_point_sample(xyz, k)
    want = oracles.furthest_point_sample(xyz, k)
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_fps_kernel_masked_and_padded(rng):
    from pytorch_points_tpu.kernels import fps as fpsk

    xyz = rng.standard_normal((3, 150, 3), dtype=np.float32)
    mask = np.ones((3, 150), bool)
    mask[:, 100:] = False
    mask[2, 0] = False
    idx = fpsk.furthest_point_sample(xyz, 24, mask)
    want = oracles.furthest_point_sample(xyz, 24, mask)
    np.testing.assert_array_equal(np.asarray(idx), want)


@pytest.mark.parametrize(
    "b,n,p,r,ns",
    [(1, 128, 16, 0.5, 8), (2, 300, 40, 0.4, 8), (1, 200, 30, 0.3, 20)],
)
def test_ball_query_kernel_matches_oracle(rng, b, n, p, r, ns):
    from pytorch_points_tpu.kernels import ballquery as bqk

    xyz = rng.uniform(-1, 1, size=(b, n, 3)).astype(np.float32)
    cen = xyz[:, :p]
    idx, cnt = bqk.ball_query(xyz, cen, r, ns)
    oidx, ocnt = oracles.ball_query(xyz, cen, r, ns)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)


def test_ball_query_kernel_masked_and_zero_hits(rng):
    from pytorch_points_tpu.kernels import ballquery as bqk

    xyz = rng.uniform(-1, 1, size=(2, 300, 3)).astype(np.float32)
    mask = np.ones((2, 300), bool)
    mask[:, 200:] = False
    # two far-away centers -> zero hits -> all-zero rows
    cen = np.concatenate(
        [xyz[:, :10], np.full((2, 2, 3), 9.0, np.float32)], axis=1
    )
    idx, cnt = bqk.ball_query(xyz, cen, 0.3, 16, mask=mask)
    oidx, ocnt = oracles.ball_query(xyz, cen, 0.3, 16, mask=mask)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    assert np.all(np.asarray(idx)[:, 10:] == 0)
    assert np.all(np.asarray(cnt)[:, 10:] == 0)


def test_auction_kernel_permutation_and_quality(rng):
    from pytorch_points_tpu.kernels import auction

    p = rng.standard_normal((2, 128, 3)).astype(np.float32)
    q = rng.standard_normal((2, 128, 3)).astype(np.float32)
    a = np.asarray(auction.auction_assignment(p, q, 0.01, 500, ti=128))
    for b in range(2):
        assert sorted(a[b].tolist()) == list(range(128))


def test_auction_kernel_optimal_tiny(rng):
    from pytorch_points_tpu.kernels import auction

    p = rng.standard_normal((3, 6, 3)).astype(np.float32)
    q = rng.standard_normal((3, 6, 3)).astype(np.float32)
    a = np.asarray(auction.auction_assignment(p, q, 0.0005, 3000, ti=128))
    opt, _ = oracles.emd_optimal(p, q)
    cost = np.array([np.sum((p[b] - q[b][a[b]]) ** 2) for b in range(3)])
    assert np.all(cost <= opt + 6 * 0.0005 + 1e-4), (cost, opt)


def test_auction_kernel_eps_scaling_and_padding(rng):
    from pytorch_points_tpu.kernels import auction

    # N=100 forces padding to 128 with twin poison pairs
    p = rng.standard_normal((2, 100, 3)).astype(np.float32)
    q = rng.standard_normal((2, 100, 3)).astype(np.float32)
    a = np.asarray(
        auction.auction_assignment(p, q, 0.005, 100, ti=128, phases=3)
    )
    for b in range(2):
        assert sorted(a[b].tolist()) == list(range(100))


@pytest.mark.parametrize("b,nq,ns,k", [(1, 100, 300, 5), (2, 129, 257, 16)])
def test_knn_kernel_matches_oracle(rng, b, nq, ns, k):
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((b, nq, 3), dtype=np.float32)
    s = rng.standard_normal((b, ns, 3), dtype=np.float32)
    d, i = topk_scan.knn(q, s, k)
    od, oi = oracles.knn(q, s, k)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(d), od, atol=1e-6, rtol=1e-6)


def test_knn_kernel_ties(rng):
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((1, 50, 3), dtype=np.float32)
    base = rng.standard_normal((1, 40, 3), dtype=np.float32)
    s = np.concatenate([base, base], axis=1)  # every distance duplicated
    d, i = topk_scan.knn(q, s, 6)
    od, oi = oracles.knn(q, s, 6)
    np.testing.assert_array_equal(np.asarray(i), oi)


@pytest.mark.parametrize("b,nq,ns,k", [(2, 300, 1024, 5), (1, 700, 1024, 16)])
def test_knn_ring_kernel_matches_oracle(rng, b, nq, ns, k):
    """Morton-ring kNN: indices identical, distances bitwise vs oracle."""
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((b, nq, 3), dtype=np.float32)
    s = rng.standard_normal((b, ns, 3), dtype=np.float32)
    d, i = topk_scan.knn_ring(q, s, k)
    od, oi = oracles.knn(q, s, k)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(d), od, atol=1e-6, rtol=1e-6)
    # vs the in-order streaming kernel: bitwise (identical diff^2 sums)
    ds, js = topk_scan.knn(q, s, k, sorted_ok=False)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ds))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(js))


def test_knn_ring_kernel_ties(rng):
    """Duplicate support points: equal distances resolve to lowest index
    through the ring kernel's lex emission + buffer tie replacement."""
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((1, 128, 3), dtype=np.float32)
    base = rng.standard_normal((1, 512, 3), dtype=np.float32)
    s = np.concatenate([base, base], axis=1)  # every distance duplicated
    d, i = topk_scan.knn_ring(q, s, 6)
    od, oi = oracles.knn(q, s, 6)
    np.testing.assert_array_equal(np.asarray(i), oi)
    ds, js = topk_scan.knn(q, s, 6, sorted_ok=False)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ds))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(js))


def test_knn_tie_eviction_across_chunks():
    """A tied pair straddling the buffer boundary under later-chunk
    eviction pressure: the buffer must evict the HIGHER id of the tie
    (round-4 stream-kernel bug: row-position eviction kept the wrong
    member; caught by the ring-kernel cross-check at bench scale).

    Layout (tm=512 chunks): ids 0,1 = the same point in chunk 0, the
    rest of chunk 0 far away; chunk 1 holds SEVEN closer points that
    arrive later and force seven evictions — the last eviction hits the
    tied pair and must remove id 1, not id 0.  k=8 == the padded buffer
    depth so the surviving member is visible in the output slice.
    """
    from pytorch_points_tpu.kernels import topk_scan

    s = np.full((1, 1024, 3), 100.0, dtype=np.float32)
    s[0, 0] = (3.0, 0.0, 0.0)
    s[0, 1] = (3.0, 0.0, 0.0)  # exact duplicate -> bitwise-tied distance
    for j in range(7):
        s[0, 512 + j] = (0.1 * (j + 1), 0.0, 0.0)
    q = np.zeros((1, 128, 3), dtype=np.float32)
    d, i = topk_scan.knn(q, s, 8, sorted_ok=False)
    od, oi = oracles.knn(q, s, 8)
    assert oi[0, 0].tolist() == [512, 513, 514, 515, 516, 517, 518, 0]
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(d), od, rtol=1e-6)


def test_knn_ring_fused_unroll_invariant(rng):
    """The round-5 fused knockout chain must be extraction-count
    invariant: unroll=1/2/3 (extractions per while iteration, chained
    through a register-resident plane with unconditional knockouts)
    give bitwise-identical results on tie-dense clouds — pins the
    monotone-verdict argument (a rejected candidate is rejected
    forever, so unconditional knockout + last-verdict exit lose
    nothing) and the in-order insert of same-iteration tied pairs."""
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((2, 256, 3), dtype=np.float32)
    base = rng.standard_normal((2, 512, 3), dtype=np.float32)
    s = np.concatenate([base, base, base], axis=1)  # 3-way ties everywhere
    ds, js = topk_scan.knn(q, s, 8, sorted_ok=False)
    for u in (1, 2, 3):
        d, i = topk_scan.knn_ring(q, s, 8, unroll=u)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(js))
        np.testing.assert_array_equal(np.asarray(d), np.asarray(ds))
    # masked twin: poisoned support, ragged valid counts, same invariance
    from pytorch_points_tpu.core.masking import poison_points

    mask = np.arange(s.shape[1])[None, :] < np.array([[1200], [997]])
    sp = poison_points(jnp.asarray(s), jnp.asarray(mask), sign=-1.0)
    dsm, jsm = topk_scan.knn(q, sp, 8, sorted_ok=False)
    for u in (1, 2):
        d, i = topk_scan.knn_ring_masked(q, sp, 8, unroll=u)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(jsm))
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dsm))


def test_knn_ring_stats_twin_identical(rng):
    """The roofline stats twin runs the same algorithm with counters:
    (d, i) bitwise vs knn_ring, visit counts within [1, nJ] per tile."""
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((2, 300, 3), dtype=np.float32)
    s = rng.standard_normal((2, 1536, 3), dtype=np.float32)
    d0, i0 = topk_scan.knn_ring(q, s, 8)
    d1, i1, st = topk_scan.knn_ring_stats(q, s, 8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    assert 0.0 < st["visit_rate"] <= 1.0
    assert st["trips_per_visit"] >= 1.0


def test_knn_ring_dispatch_path():
    """ops.knn routes unmasked large supports to the ring kernel and
    masked large supports to the masked ring kernel (valid-AABB sort)."""
    from pytorch_points_tpu.ops.grouping import knn_path

    q = jnp.zeros((1, 128, 3))
    s_small = jnp.zeros((1, 1024, 3))
    s_big = jnp.zeros((1, 8192, 3))
    on_tpu = jax.default_backend() == "tpu"
    assert knn_path(q, s_big, 8) == ("ring" if on_tpu else "xla")
    assert knn_path(q, s_small, 8) == ("stream" if on_tpu else "xla")
    mask = jnp.ones((1, 8192), bool)
    assert knn_path(q, s_big, 8, support_mask=mask) == (
        "ring_masked" if on_tpu else "xla"
    )


@pytest.mark.parametrize("b,nq,ns,k", [(2, 300, 1024, 5), (1, 257, 1536, 16)])
def test_knn_ring_masked_matches_stream(rng, b, nq, ns, k):
    """Masked ring kNN (valid-AABB Morton sort, poison-last,
    scalar-prefetched ring centers) is bitwise-identical to the in-order
    streaming kernel and the dense oracle on the same poisoned cloud —
    ragged per-cloud valid counts, duplicate (tied) valid points included."""
    from pytorch_points_tpu.core.masking import poison_points
    from pytorch_points_tpu.kernels import topk_scan

    q = rng.standard_normal((b, nq, 3), dtype=np.float32)
    s = rng.standard_normal((b, ns, 3), dtype=np.float32)
    s[:, 100:110] = s[:, 0:10]  # duplicate ties among valid points
    n_valid = np.array([int(ns * 0.7) - 13 * i for i in range(b)])
    mask = np.arange(ns)[None, :] < n_valid[:, None]
    sp = poison_points(jnp.asarray(s), jnp.asarray(mask), sign=-1.0)

    d, i = topk_scan.knn_ring_masked(q, sp, k)
    ds, js = topk_scan.knn(q, sp, k, sorted_ok=False)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(js))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(ds))
    od, oi = oracles.knn(q, np.asarray(sp), k)
    np.testing.assert_array_equal(np.asarray(i), oi)
    # no poisoned row is ever returned (every cloud has >= k valid points)
    assert bool(np.all(np.asarray(i) < n_valid[:, None, None]))


@pytest.mark.skipif(
    os.environ.get("PPT_TEST_TPU") != "1",
    reason="hardware-scale exactness check (ring vs streaming kNN at the "
    "dispatch threshold is too slow in interpret mode); runs in the "
    "PPT_TEST_TPU=1 suite",
)
def test_knn_ring_bitwise_vs_stream_at_scale(rng):
    """At the graded config-6 shape the ring kernel must agree bitwise
    with the in-order streaming kernel (both AABB skip soundness and the
    increasing-threshold extraction's tie handling only face real
    pressure at scale)."""
    from pytorch_points_tpu.kernels import topk_scan

    x = rng.uniform(-1, 1, (4, 16384, 3)).astype(np.float32)
    x[:, 1000:1128] = x[:, :128]  # forced duplicate ties
    xs = jnp.asarray(x)
    d1, i1 = jax.jit(
        lambda a: topk_scan.knn(a, a, 16, sorted_ok=False)
    )(xs)
    d2, i2 = jax.jit(lambda a: topk_scan.knn_ring(a, a, 16))(xs)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.skipif(
    os.environ.get("PPT_TEST_TPU") != "1",
    reason="hardware-scale exactness check; runs in the PPT_TEST_TPU=1 suite",
)
def test_knn_ring_masked_bitwise_vs_stream_at_scale(rng):
    """Masked twin of the at-scale cross-check: ragged valid counts at the
    graded config-6 shape, the masked ring kernel must agree bitwise with
    the in-order streaming kernel on the same poisoned clouds."""
    from pytorch_points_tpu.core.masking import poison_points
    from pytorch_points_tpu.kernels import topk_scan

    x = rng.uniform(-1, 1, (4, 16384, 3)).astype(np.float32)
    x[:, 1000:1128] = x[:, :128]  # forced duplicate ties
    n_valid = np.array([16384, 12288, 16384 * 3 // 4 - 77, 9001])
    mask = np.arange(16384)[None, :] < n_valid[:, None]
    xp = poison_points(jnp.asarray(x), jnp.asarray(mask), sign=-1.0)
    d1, i1 = jax.jit(
        lambda a, b: topk_scan.knn(a, b, 16, sorted_ok=False)
    )(jnp.asarray(x), xp)
    d2, i2 = jax.jit(
        lambda a, b: topk_scan.knn_ring_masked(a, b, 16)
    )(jnp.asarray(x), xp)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert bool(np.all(np.asarray(i2) < n_valid[:, None, None]))


def test_gather_kernel_bitwise_exact(rng):
    from pytorch_points_tpu.kernels.gather import gather_rows

    feat = rng.standard_normal((2, 300, 3)).astype(np.float32)
    idx = rng.integers(0, 300, (2, 500)).astype(np.int32)
    out = np.asarray(gather_rows(feat, idx))
    want = np.stack([feat[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(out, want)  # bitwise


def test_scatter_kernel_matches_dense(rng):
    from pytorch_points_tpu.kernels.scatter import scatter_add_csum

    idx = rng.integers(0, 200, (2, 400)).astype(np.int32)
    g = rng.standard_normal((2, 400, 3)).astype(np.float32)
    out = np.asarray(scatter_add_csum(jnp.asarray(idx), jnp.asarray(g), 200))
    want = np.zeros((2, 200, 3), np.float32)
    for b in range(2):
        for k in range(400):
            want[b, idx[b, k]] += g[b, k]
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-5)


def test_fused_ball_query_group_coords(rng):
    from pytorch_points_tpu.kernels import ballquery as bqk

    xyz = rng.uniform(-1, 1, size=(2, 300, 3)).astype(np.float32)
    cen = xyz[:, :40]
    idx, cnt, g = bqk.ball_query_and_group_coords(xyz, cen, 0.4, 8)
    oidx, ocnt = oracles.ball_query(xyz, cen, 0.4, 8)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    want = oracles.group_points(xyz, oidx) - cen[:, :, None, :]
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_sample_and_group_fused_matches_xla_with_grads(rng):
    from pytorch_points_tpu.ops import sample_and_group

    xyz = rng.uniform(-1, 1, size=(1, 128, 3)).astype(np.float32)

    def summed(x, impl):
        _, nf, _, _ = sample_and_group(
            x, None, npoint=16, nsample=8, radius=0.5, impl=impl
        )
        return jnp.sum(nf**2)

    v_p, g_p = jax.value_and_grad(lambda x: summed(x, "pallas"))(
        jnp.asarray(xyz)
    )
    v_x, g_x = jax.value_and_grad(lambda x: summed(x, "xla"))(
        jnp.asarray(xyz)
    )
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


@pytest.mark.parametrize("shape_p,shape_q", [((2, 300, 3), (2, 420, 3))])
def test_pruned_chamfer_matches_oracle(rng, shape_p, shape_q):
    from pytorch_points_tpu.kernels import distance_tiles as dt

    p = rng.uniform(-1, 1, shape_p).astype(np.float32)
    q = rng.uniform(-1, 1, shape_q).astype(np.float32)
    d1, i1, d2, i2 = dt.nn_both_directions_pruned(p, q)
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-6)
    # exact distances; on tie-free data indices match the oracle too
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_array_equal(np.asarray(i2), oi2)
