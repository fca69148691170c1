import jax
import jax.numpy as jnp
import numpy as np

import oracles
from pytorch_points_tpu.ops import (
    ball_query,
    group_knn,
    group_points,
    knn,
    sample_and_group,
)


def test_knn_matches_oracle(rng):
    q = rng.standard_normal((3, 45, 3), dtype=np.float32)
    s = rng.standard_normal((3, 67, 3), dtype=np.float32)
    dist, idx = knn(q, s, 5)
    odist, oidx = oracles.knn(q, s, 5)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(dist), odist, atol=1e-5, rtol=1e-5)


def test_knn_masked(rng):
    q = rng.standard_normal((2, 20, 3), dtype=np.float32)
    s = rng.standard_normal((2, 40, 3), dtype=np.float32)
    mask = np.ones((2, 40), bool)
    mask[:, 25:] = False
    _, idx = knn(q, s, 4, support_mask=mask)
    _, oidx = oracles.knn(q, s[:, :25], 4)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32)
    centroids = xyz[:, :16]
    idx, cnt = ball_query(xyz, centroids, 0.4, 8)
    oidx, ocnt = oracles.ball_query(xyz, centroids, 0.4, 8)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)


def test_ball_query_zero_hits(rng):
    xyz = np.ones((1, 10, 3), np.float32) * 5.0
    centroids = np.zeros((1, 2, 3), np.float32)
    idx, cnt = ball_query(xyz, centroids, 0.1, 4)
    assert np.all(np.asarray(idx) == 0)
    assert np.all(np.asarray(cnt) == 0)


def test_ball_query_masked(rng):
    xyz = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    mask = np.ones((2, 64), bool)
    mask[:, 40:] = False
    centroids = xyz[:, :8]
    idx, cnt = ball_query(xyz, centroids, 0.5, 6, mask=mask)
    oidx, ocnt = oracles.ball_query(xyz, centroids, 0.5, 6, mask=mask)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)


def test_group_points_matches_oracle(rng):
    feats = rng.standard_normal((2, 30, 6), dtype=np.float32)
    idx = rng.integers(0, 30, size=(2, 10, 4)).astype(np.int32)
    out = group_points(feats, idx)
    np.testing.assert_allclose(
        np.asarray(out), oracles.group_points(feats, idx), rtol=1e-6
    )


def test_group_points_grad_scatter_add(rng):
    feats = rng.standard_normal((1, 12, 2), dtype=np.float32)
    idx = rng.integers(0, 12, size=(1, 5, 3)).astype(np.int32)

    def loss(f):
        return jnp.sum(group_points(f, idx))

    g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    want = np.zeros_like(feats)
    for p in range(5):
        for s in range(3):
            want[0, idx[0, p, s]] += 1.0
    np.testing.assert_allclose(g, want, rtol=1e-6)


def test_group_points_grad_bf16_pallas_dtype(rng):
    """bf16 features through the Pallas scatter backward must yield bf16
    cotangents (regression: the lane-major kernel accumulates in f32 and
    returned f32, a hard custom_vjp dtype error under value_and_grad on
    TPU — only reachable at >=4096 updates with impl=pallas, so the CPU
    suite never dispatched it; bench config5b crashed)."""
    from pytorch_points_tpu.kernels import dispatch

    feats = jnp.asarray(
        rng.standard_normal((1, 64, 4), dtype=np.float32), jnp.bfloat16
    )
    idx = jnp.asarray(rng.integers(0, 64, size=(1, 1024, 4)), jnp.int32)

    def loss(f):
        return jnp.sum(group_points(f, idx).astype(jnp.float32))

    dispatch.force_impl("pallas")
    try:
        g = jax.grad(loss)(feats)
    finally:
        dispatch.force_impl(None)
    assert g.dtype == jnp.bfloat16
    g_xla = jax.grad(loss)(feats)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(g_xla, np.float32),
        rtol=0.02, atol=0.5,
    )


def test_group_knn_composite(rng):
    q = rng.standard_normal((2, 10, 3), dtype=np.float32)
    s = rng.standard_normal((2, 30, 3), dtype=np.float32)
    grouped, idx, dist = group_knn(4, q, s)
    odist, oidx = oracles.knn(q, s, 4)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(
        np.asarray(grouped), oracles.group_points(s, oidx), rtol=1e-6
    )


def test_group_knn_unique_dedups_duplicate_points(rng):
    """unique=True: exact duplicate support points are returned at most
    once (lowest-index copy); unique=False returns them all."""
    q = rng.standard_normal((1, 4, 3)).astype(np.float32)
    s = rng.standard_normal((1, 20, 3)).astype(np.float32)
    # make points 7, 12, 15 exact copies of point 3, adjacent to query 0
    s[0, 3] = q[0, 0] + 0.01
    for j in (7, 12, 15):
        s[0, j] = s[0, 3]
    sj, qj = jnp.asarray(s), jnp.asarray(q)

    _, idx_dup, _ = group_knn(4, qj, sj, unique=False)
    assert 3 in np.asarray(idx_dup)[0, 0]
    assert 7 in np.asarray(idx_dup)[0, 0]  # duplicates crowd the hood

    grouped, idx, dist = group_knn(4, qj, sj, unique=True)
    row = np.asarray(idx)[0, 0]
    assert 3 in row and not ({7, 12, 15} & set(row.tolist()))
    coords = np.asarray(grouped)[0, 0]
    assert len({tuple(c) for c in coords.tolist()}) == 4  # distinct coords

    # with a validity mask: masked-out canonical copy promotes nothing —
    # the duplicate group's lowest *valid* index is dedup-canonical
    mask = np.ones((1, 20), bool)
    mask[0, 3] = False
    _, idx_m, _ = group_knn(4, qj, sj, support_mask=jnp.asarray(mask),
                            unique=True)
    row_m = set(np.asarray(idx_m)[0, 0].tolist())
    assert 3 not in row_m
    assert len({7, 12, 15} & row_m) == 1


def test_sample_and_group_shapes_and_semantics(rng):
    xyz = rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32)
    feats = rng.standard_normal((2, 128, 8), dtype=np.float32)
    new_xyz, new_feats, idx, grouped_xyz = sample_and_group(
        xyz, feats, npoint=16, nsample=8, radius=0.5
    )
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 8, 11)  # 3 (xyz) + 8 features
    assert idx.shape == (2, 16, 8)
    # centered coords: grouped - centroid
    fps_idx = oracles.furthest_point_sample(xyz, 16)
    want_centroids = np.stack([xyz[b][fps_idx[b]] for b in range(2)])
    np.testing.assert_allclose(np.asarray(new_xyz), want_centroids, rtol=1e-6)
    oidx, _ = oracles.ball_query(xyz, want_centroids, 0.5, 8)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    centered = np.asarray(new_feats)[..., :3]
    want_centered = oracles.group_points(xyz, oidx) - want_centroids[:, :, None, :]
    np.testing.assert_allclose(centered, want_centered, atol=1e-6)


def test_sample_and_group_knn_mode(rng):
    xyz = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
    new_xyz, new_feats, idx, _ = sample_and_group(
        xyz, None, npoint=8, nsample=4, radius=None
    )
    assert new_feats.shape == (1, 8, 4, 3)
    _, oidx = oracles.knn(np.asarray(new_xyz), xyz, 4)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_sample_and_group_sorted_same_sets(rng):
    """sample_and_group_sorted returns the same neighborhood sets as the
    reference-ordered path, up to centroid order and within-group order
    (nsample chosen large enough that no ball saturates)."""
    from pytorch_points_tpu.ops import sample_and_group, sample_and_group_sorted

    xyz = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    nx0, gf0, _, _ = sample_and_group(xyz, None, 64, 48, 0.25)
    nxs, gfs, _, _, _ = sample_and_group_sorted(xyz, None, 64, 48, 0.25)
    nx0, gf0, nxs, gfs = map(np.asarray, (nx0, gf0, nxs, gfs))
    # centroid SETS equal (Morton order vs FPS order)
    for b in range(2):
        s0 = {tuple(r) for r in nx0[b].round(6).tolist()}
        ss = {tuple(r) for r in nxs[b].round(6).tolist()}
        assert s0 == ss
        # match centroids, compare neighborhood sets of centered coords
        key0 = {tuple(r): i for i, r in enumerate(nx0[b].round(6).tolist())}
        for i, r in enumerate(nxs[b].round(6).tolist()):
            j = key0[tuple(r)]
            g0 = {tuple(x) for x in gf0[b, j].round(5).tolist()}
            gs = {tuple(x) for x in gfs[b, i].round(5).tolist()}
            assert g0 == gs, (b, i, j)


def test_sa_module_sorted_pipeline_pooled_equal(rng):
    """SA layer pooled features are invariant to the sorted pipeline (up
    to centroid permutation)."""
    from flax import nnx

    from pytorch_points_tpu.layers import PointNetSAModule

    xyz = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    kw = dict(npoint=64, radius=0.25, nsample=48, norm=None)
    sa0 = PointNetSAModule(0, [16, 32], rngs=nnx.Rngs(0), **kw)
    sas = PointNetSAModule(0, [16, 32], rngs=nnx.Rngs(0),
                           sorted_pipeline=True, **kw)
    nx0, f0 = sa0(xyz)
    nxs, fs = sas(xyz)
    nx0, f0, nxs, fs = map(np.asarray, (nx0, f0, nxs, fs))
    for b in range(2):
        key0 = {tuple(r): i for i, r in enumerate(nx0[b].round(6).tolist())}
        perm = [key0[tuple(r)] for r in nxs[b].round(6).tolist()]
        np.testing.assert_allclose(fs[b], f0[b][perm], atol=2e-5)
