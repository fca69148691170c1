import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_points_tpu import compat, geo
from pytorch_points_tpu.losses import (
    ChamferLoss,
    MeshEdgeLengthLoss,
    MeshLaplacianLoss,
    NormalLoss,
    PointEdgeLengthLoss,
    PointLaplacianLoss,
    SmapeLoss,
    UniformLoss,
)
from pytorch_points_tpu.utils import geometry_utils, pc_utils
from pytorch_points_tpu.utils.train_utils import (
    check_values,
    clamp_gradients,
    load_network,
    save_network,
)


# ---------------------------------------------------------------- pc I/O


def test_ply_roundtrip_binary_and_ascii(rng, tmp_path):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    normals = rng.standard_normal((100, 3)).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"cloud_{binary}.ply"
        pc_utils.save_ply(pts, p, normals=normals, binary=binary)
        xyz, nrm = pc_utils.read_ply(p, load_normals=True)
        np.testing.assert_allclose(xyz, pts, atol=1e-5)
        np.testing.assert_allclose(nrm, normals, atol=1e-5)


def test_ply_colors_roundtrip(rng, tmp_path):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    p = tmp_path / "colored.ply"
    pc_utils.save_ply(pts, p, colors=colors)
    xyz, col = pc_utils.read_ply(p, load_colors=True)
    np.testing.assert_allclose(xyz, pts, atol=1e-5)
    np.testing.assert_array_equal(col, colors)


def test_save_ply_property(rng, tmp_path):
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    prop = rng.standard_normal(30)
    p = tmp_path / "prop.ply"
    pc_utils.save_ply_property(pts, prop, p)
    xyz, col = pc_utils.read_ply(p, load_colors=True)
    assert col is not None and col.shape == (30, 3)


def test_fps_np_matches_oracle(rng):
    import oracles

    xyz = rng.standard_normal((200, 3)).astype(np.float32)
    got = pc_utils.furthest_point_sample_np(xyz, 32)
    want = oracles.furthest_point_sample(xyz[None], 32)[0]
    np.testing.assert_array_equal(got, want)


def test_augmentations(rng):
    xyz = rng.standard_normal((64, 3)).astype(np.float32)
    j = pc_utils.jitter_perturbation_point_cloud(xyz, seed=0)
    assert np.abs(j - xyz).max() <= 0.05 + 1e-6
    r, n = pc_utils.rotate_point_cloud(xyz, normals=xyz, seed=0)
    np.testing.assert_allclose(
        np.linalg.norm(r, axis=-1), np.linalg.norm(xyz, axis=-1), rtol=1e-5
    )


# ---------------------------------------------------------------- mesh I/O


def test_mesh_io_roundtrip(tmp_path):
    verts, faces = geometry_utils.generate_icosphere(1)
    for ext in ("obj", "off", "ply"):
        p = tmp_path / f"m.{ext}"
        geometry_utils.write_mesh(p, verts, faces)
        v2, f2 = geometry_utils.read_mesh(p)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)


def test_binary_ply_mesh_read(tmp_path):
    """Binary little/big-endian PLY meshes (tri fast path + mixed arity)."""
    verts, faces = geometry_utils.generate_icosphere(1)
    for order, fmt in (("<", "binary_little_endian"), (">", "binary_big_endian")):
        p = tmp_path / f"bin_{fmt}.ply"
        with open(p, "wb") as f:
            f.write(
                (
                    f"ply\nformat {fmt} 1.0\n"
                    f"element vertex {len(verts)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    f"element face {len(faces)}\n"
                    "property list uchar int vertex_indices\nend_header\n"
                ).encode()
            )
            f.write(verts.astype(order + "f4").tobytes())
            for tri in faces:
                f.write(np.uint8(3).tobytes())
                f.write(tri.astype(order + "i4").tobytes())
        v2, f2 = geometry_utils.read_mesh(p)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)

    # mixed arity: one quad + one triangle, quad fan-triangulated
    quadverts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [2, 0, 0]], np.float32
    )
    p = tmp_path / "mixed.ply"
    with open(p, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 5\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"element face 2\n"
            b"property list uchar int vertex_indices\nend_header\n"
        )
        f.write(quadverts.astype("<f4").tobytes())
        f.write(np.uint8(4).tobytes())
        f.write(np.array([0, 1, 2, 3], "<i4").tobytes())
        f.write(np.uint8(3).tobytes())
        f.write(np.array([1, 4, 2], "<i4").tobytes())
    v2, f2 = geometry_utils.read_mesh(p)
    np.testing.assert_allclose(v2, quadverts, atol=1e-6)
    np.testing.assert_array_equal(
        f2, np.array([[0, 1, 2], [0, 2, 3], [1, 4, 2]], np.int32)
    )


def test_grid_mesh():
    verts, faces = geometry_utils.generate_grid_mesh(4, 5)
    assert verts.shape == (20, 3)
    assert faces.shape == (2 * 3 * 4, 3)
    assert faces.max() < 20


# ---------------------------------------------------------------- geo ops


def test_sphere_normals_and_curvature():
    verts, faces = geometry_utils.generate_icosphere(3, radius=2.0)
    vn = np.asarray(geo.vertex_normals(verts, faces))
    outward = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    dots = np.sum(vn * outward, -1)
    assert dots.min() > 0.99  # sphere normals point radially outward
    # mean curvature of a radius-2 sphere is 1/2
    h = np.asarray(geo.mean_curvature(verts, faces))
    np.testing.assert_allclose(np.median(h), 0.5, rtol=0.15)


def test_uniform_laplacian_flat_interior():
    verts, faces = geometry_utils.generate_grid_mesh(8, 8)
    edges = geo.mesh_edges(faces)
    lap = np.asarray(geo.uniform_laplacian(verts, edges))
    # interior vertices of a regular grid: laplacian ~ 0 in z
    assert np.abs(lap[:, 2]).max() < 1e-6


def test_cot_laplacian_sphere_points_inward():
    verts, faces = geometry_utils.generate_icosphere(2)
    lap = np.asarray(geo.cot_laplacian(verts, faces))
    outward = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    cos = np.sum(lap * outward, -1) / np.maximum(
        np.linalg.norm(lap, axis=-1), 1e-12
    )
    assert cos.max() < -0.9  # laplacian points inward on a sphere


def test_edge_lengths_and_dihedral():
    verts, faces = geometry_utils.generate_icosphere(1)
    edges = geo.mesh_edges(faces)
    el = np.asarray(geo.edge_lengths(verts, edges))
    assert el.min() > 0
    cos, pairs = geo.dihedral_angles(verts, faces)
    assert pairs.shape[1] == 2
    assert np.asarray(cos).min() > 0.5  # sphere: near-coplanar neighbors


# ---------------------------------------------------------------- losses


def test_losses_finite_and_sane(rng):
    gt = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    pred = gt + 0.05 * jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    assert float(ChamferLoss()(pred, gt)) > 0
    assert float(ChamferLoss(percentage=0.8)(pred, gt)) <= float(
        ChamferLoss()(pred, gt)
    )
    assert float(SmapeLoss()(pred, gt)) > 0
    assert float(PointLaplacianLoss()(gt, pred)) > 0
    assert float(PointEdgeLengthLoss()(gt, pred)) > 0
    n1 = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    assert float(NormalLoss()(pred, n1, gt, n1)) >= 0
    assert np.isfinite(float(UniformLoss(npoint=16)(gt)))


def test_identity_losses_zero(rng):
    gt = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    assert float(ChamferLoss()(gt, gt)) < 1e-10
    assert float(PointLaplacianLoss()(gt, gt)) < 1e-10
    assert float(PointEdgeLengthLoss()(gt, gt)) < 1e-10
    assert float(SmapeLoss()(gt, gt)) < 1e-10


def test_mesh_losses(rng):
    verts, faces = geometry_utils.generate_icosphere(1)
    edges = geo.mesh_edges(faces)
    v = jnp.asarray(verts)[None]
    v2 = v + 0.01 * jnp.asarray(rng.standard_normal(v.shape), jnp.float32)
    assert float(MeshLaplacianLoss()(v2, edges, v)) > 0
    assert float(MeshLaplacianLoss()(v, edges, v)) < 1e-10
    assert float(MeshEdgeLengthLoss()(v2, edges, v)) > 0


# ---------------------------------------------------------------- ckpt


def test_checkpoint_roundtrip_and_tolerant_load(tmp_path, rng):
    from pytorch_points_tpu.models import PointCloudAutoencoder

    model = PointCloudAutoencoder(npoint1=8, npoint2=4, rngs=nnx.Rngs(0))
    _, params = nnx.split(model)
    path = save_network(params, tmp_path / "ckpt", step=3)
    assert os.path.exists(path)

    model2 = PointCloudAutoencoder(npoint1=8, npoint2=4, rngs=nnx.Rngs(7))
    _, params2 = nnx.split(model2)
    restored, _ = load_network(params2, tmp_path / "ckpt", step=3)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


import jax  # noqa: E402


def test_check_values_and_clamp(rng):
    good = {"a": jnp.ones(3)}
    bad = {"a": jnp.array([1.0, jnp.nan])}
    assert check_values(good)
    assert not check_values(bad)
    grads = {"w": jnp.full((10,), 10.0)}
    clipped, norm = clamp_gradients(grads, max_norm=1.0)
    assert float(jnp.linalg.norm(clipped["w"])) <= 1.0 + 1e-5


# ---------------------------------------------------------------- compat


def test_compat_layouts(rng):
    import oracles

    xyz_bcn = jnp.asarray(rng.standard_normal((2, 3, 100)), jnp.float32)
    sampled, idx = compat.furthest_point_sample(xyz_bcn, 16)
    assert sampled.shape == (2, 3, 16)
    want = oracles.furthest_point_sample(
        np.swapaxes(np.asarray(xyz_bcn), 1, 2), 16
    )
    np.testing.assert_array_equal(np.asarray(idx), want)

    feats = jnp.asarray(rng.standard_normal((2, 7, 100)), jnp.float32)
    g = compat.gather_points(feats, idx)
    assert g.shape == (2, 7, 16)

    grouped, kidx, dist = compat.group_knn(5, sampled, xyz_bcn)
    assert grouped.shape == (2, 3, 16, 5)

    new_xyz, new_pts, _, grouped_xyz = compat.sample_and_group(
        xyz_bcn, feats, npoint=8, nsample=4, radius=0.8
    )
    assert new_xyz.shape == (2, 3, 8)
    assert new_pts.shape == (2, 10, 8, 4)  # 3 + 7 channels
    assert grouped_xyz.shape == (2, 3, 8, 4)

    out, centroid, rad = compat.normalize_point_batch(xyz_bcn)
    assert out.shape == xyz_bcn.shape and centroid.shape == (2, 3, 1)


# ---------------------------------------------------------------- native


def test_native_library_if_built(rng, tmp_path):
    from pytorch_points_tpu import _native

    if not _native.available():
        pytest.skip("native library not built")
    import oracles

    xyz = rng.standard_normal((500, 3)).astype(np.float32)
    # fast PLY path vs python writer/reader
    p = tmp_path / "n.ply"
    pc_utils.save_ply(xyz, p, binary=True)
    got = _native.read_ply_xyz(str(p))
    np.testing.assert_allclose(got, xyz, atol=1e-6)
    # native FPS == oracle
    idx = _native.fps(xyz, 64)
    want = oracles.furthest_point_sample(xyz[None], 64)[0]
    np.testing.assert_array_equal(idx, want)
    # grid subsample: fewer points, inside bbox
    sub = _native.grid_subsample(xyz, 0.5)
    assert 0 < sub.shape[0] <= 500
    assert sub.min() >= xyz.min() - 1e-5 and sub.max() <= xyz.max() + 1e-5


def test_weights_init_and_scatter_add(rng):
    from flax import nnx as _nnx

    from pytorch_points_tpu.models import PointNet2Classifier
    from pytorch_points_tpu.ops import scatter_add
    from pytorch_points_tpu.utils import weights_init

    model = PointNet2Classifier(num_classes=5, rngs=_nnx.Rngs(0))
    _, params = _nnx.split(model)
    re = weights_init(params, "xavier_normal", seed=1)
    # kernels changed, biases unchanged
    changed = unchanged = 0
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(re)[0],
    ):
        if "kernel" in jax.tree_util.keystr(pa) and a.ndim >= 2:
            assert not np.allclose(np.asarray(a), np.asarray(b))
            changed += 1
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            unchanged += 1
    assert changed > 5 and unchanged > 5

    tgt = jnp.zeros((1, 5, 2))
    idx = np.array([[0, 3, 0]], np.int32)
    upd = jnp.ones((1, 3, 2))
    out = np.asarray(scatter_add(tgt, idx, upd))
    assert out[0, 0, 0] == 2.0 and out[0, 3, 0] == 1.0 and out[0, 1, 0] == 0


# ---------------------------------------------------------------- cages


def test_mean_value_coordinates_reproduction(rng):
    from pytorch_points_tpu.geo import deform_with_cage, mean_value_coordinates

    cv, cf = geometry_utils.generate_icosphere(1, radius=2.0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = pts * rng.uniform(0.1, 0.9, (100, 1)).astype(np.float32)
    w = mean_value_coordinates(jnp.asarray(pts), cv, cf)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w @ cv), pts, atol=2e-3)  # f32 on TPU: div/rsqrt chains cost ~1e-3
    # affine invariance
    t = np.array([0.3, -0.2, 0.5], np.float32)
    moved = np.asarray(deform_with_cage(w, cv * 1.5 + t))
    np.testing.assert_allclose(moved, pts * 1.5 + t, atol=2e-4)


def test_cage_deformer_model(rng):
    from flax import nnx as _nnx

    from pytorch_points_tpu.models import CageDeformer

    cv, cf = geometry_utils.generate_icosphere(0, radius=2.0)  # 12 verts
    model = CageDeformer(cv.shape[0], npoint1=16, npoint2=8, rngs=_nnx.Rngs(0))
    src = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.5
    tgt = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.5
    deformed, new_cage, w = model(jnp.asarray(src), jnp.asarray(tgt), cv, cf)
    assert deformed.shape == (2, 64, 3)
    assert new_cage.shape == (2, 12, 3)
    assert bool(jnp.all(jnp.isfinite(deformed)))
    # zero offsets would reproduce the source; offsets are bounded
    assert float(jnp.abs(new_cage - cv[None]).max()) <= model.offset_scale + 1e-6


# ---------------------------------------------------------------- metrics


def test_metrics(rng):
    from pytorch_points_tpu.losses import (
        chamfer_l1,
        coverage_and_mmd,
        fscore,
        hausdorff_distance,
    )

    gt = rng.standard_normal((2, 64, 3)).astype(np.float32)
    # identical clouds: perfect scores
    h = hausdorff_distance(gt, gt.copy())
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-6)
    f, p, r = fscore(gt, gt.copy(), threshold=0.01)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-6)
    assert float(chamfer_l1(gt, gt.copy()).max()) < 1e-5

    # hausdorff catches a single outlier that chamfer-mean dilutes
    pred = gt.copy()
    pred[:, 0] += 5.0
    assert float(hausdorff_distance(pred, gt).min()) > 4.0

    gen = rng.standard_normal((3, 32, 3)).astype(np.float32)
    ref = np.concatenate([gen[:2] + 0.01, rng.standard_normal((2, 32, 3)).astype(np.float32) + 5], 0)
    cov, mmd = coverage_and_mmd(jnp.asarray(gen), jnp.asarray(ref))
    assert 0.0 <= float(cov) <= 1.0
    assert float(mmd) >= 0.0

    # 1-NNA: well-separated sets classify perfectly; a set vs a near
    # copy of itself is at chance (each cloud's NN is its twin in the
    # other set).
    from pytorch_points_tpu.losses import one_nn_accuracy

    far = gen + 50.0
    assert float(one_nn_accuracy(jnp.asarray(gen), jnp.asarray(far))) == 1.0
    twin = gen + 1e-4
    acc = float(one_nn_accuracy(jnp.asarray(gen), jnp.asarray(twin)))
    assert acc <= 0.5


def test_metric_emd_operating_point(rng, monkeypatch):
    """Metric EMD solves default to the measured metric operating point
    (pop 384 — ranking-identical to the raw op's 768, ~20% cheaper,
    bench/probe_r5_cov_mmd_cheap), and user emd_kwargs override it."""
    from pytorch_points_tpu.losses import metrics as M

    assert M._METRIC_EMD_DEFAULTS == {"endgame_pop_cap": 384}

    seen = []
    real = M.earth_mover_distance

    def spy(a, b, **kw):
        seen.append(kw)
        return real(a, b, **kw)

    monkeypatch.setattr(M, "earth_mover_distance", spy)
    gen = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    M.coverage_and_mmd(gen, ref, metric="emd")
    assert seen and all(kw["endgame_pop_cap"] == 384 for kw in seen)
    seen.clear()
    M.one_nn_accuracy(gen, ref, metric="emd",
                      emd_kwargs={"endgame_pop_cap": 768})
    assert seen and all(kw["endgame_pop_cap"] == 768 for kw in seen)


def test_metric_pair_batching_matches_per_pair(rng):
    """The chunked [pb,N,3] pair solver must equal one-at-a-time solves
    (incl. ragged final chunk) — the literature-scale path is just a
    batching of the same kernel calls."""
    from pytorch_points_tpu.losses.metrics import _pair_dists_batched
    from pytorch_points_tpu.ops import earth_mover_distance, nndistance

    gen = jnp.asarray(rng.standard_normal((5, 48, 3)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((3, 48, 3)), jnp.float32)
    ia = jnp.repeat(jnp.arange(5), 3)
    ib = jnp.tile(jnp.arange(3), 5)  # 15 pairs, pair_batch=4 -> ragged tail

    got = _pair_dists_batched(gen, ref, ia, ib, "chamfer", None, 4)
    want = []
    for i, j in zip(np.asarray(ia), np.asarray(ib)):
        d1, _, d2, _ = nndistance(gen[i][None], ref[j][None])
        want.append(float(jnp.mean(d1) + jnp.mean(d2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    got_e = _pair_dists_batched(gen, ref, ia, ib, "emd", None, 4)
    want_e = []
    for i, j in zip(np.asarray(ia), np.asarray(ib)):
        dist, _ = earth_mover_distance(gen[i][None], ref[j][None])
        want_e.append(float(jnp.mean(dist)))
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=1e-5)


# ---------------------------------------------------------------- splatting


def test_render_points_silhouette_and_gradients(rng):
    import jax as _jax

    from pytorch_points_tpu.geo import Camera, render_points

    # a flat square of points facing the camera
    g = np.linspace(-0.5, 0.5, 12, dtype=np.float32)
    gx, gy = np.meshgrid(g, g)
    pts = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(1, -1, 3)
    img, alpha = render_points(
        jnp.asarray(pts), image_size=64, splat_radius=0.06
    )
    a = np.asarray(alpha)[0]
    # center covered, corners empty
    assert a[32, 32] > 0.9
    assert a[2, 2] < 0.05
    assert img.shape == (1, 64, 64, 1)

    # occlusion: red plane in front of blue plane -> image is red
    front = pts.copy()
    front[..., 2] = 0.5  # closer to the camera at z=3... wait eye=(0,0,3)
    back = pts.copy()
    colors = np.zeros((1, pts.shape[1] * 2, 3), np.float32)
    colors[:, : pts.shape[1], 0] = 1.0  # front red
    colors[:, pts.shape[1] :, 2] = 1.0  # back blue
    both = np.concatenate([front, back], axis=1)
    img2, _ = render_points(
        jnp.asarray(both), jnp.asarray(colors), image_size=64,
        splat_radius=0.06, depth_temperature=1e-3
    )
    center = np.asarray(img2)[0, 32, 32]
    assert center[0] > 0.9 and center[2] < 0.1, center

    # gradients flow to positions (the DSS property)
    target = np.asarray(img)[0]

    def loss(p):
        im, _ = render_points(p, image_size=64, splat_radius=0.06)
        return jnp.mean((im[0] - target) ** 2)

    shifted = jnp.asarray(pts + np.array([0.2, 0.0, 0.0], np.float32))
    gr = _jax.grad(loss)(shifted)
    assert bool(jnp.all(jnp.isfinite(gr)))
    assert float(jnp.abs(gr[..., 0]).max()) > 0  # x-shift produces x-grad


def test_trimmed_chamfer_with_mask(rng):
    """percentage<1 + mask: padded points must not crowd the kept set."""
    p = rng.standard_normal((1, 20, 3)).astype(np.float32)
    q = rng.standard_normal((1, 30, 3)).astype(np.float32)
    pad_p = np.concatenate([p, rng.standard_normal((1, 12, 3)).astype(np.float32)], 1)
    mask = np.zeros((1, 32), bool)
    mask[:, :20] = True
    trimmed = ChamferLoss(percentage=0.5, one_sided=True)
    got = float(trimmed(jnp.asarray(pad_p), jnp.asarray(q), pred_mask=jnp.asarray(mask)))
    # oracle: smallest 50% of the 20 *valid* forward distances — the keep
    # fraction is of the valid count, so padding cannot change the loss
    import oracles

    d1, _, _, _ = oracles.nndistance(p, q)
    keep = 10  # int(20 * 0.5)
    want = float(np.sort(d1[0])[:keep].mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # invariance: same clouds without padding give the same loss
    got_clean = float(trimmed(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(got, got_clean, rtol=1e-5)


def test_chamfer_loss_threshold(rng):
    """threshold: distances >= threshold contribute 0 (outlier cut),
    denominator unchanged — lineage semantics, see PARITY.md audit."""
    p = rng.standard_normal((1, 12, 3)).astype(np.float32)
    q = rng.standard_normal((1, 9, 3)).astype(np.float32)
    import oracles

    d1, _, d2, _ = oracles.nndistance(p, q)
    thr = float(np.median(d1))
    loss = ChamferLoss(threshold=thr)
    got = float(loss(jnp.asarray(p), jnp.asarray(q)))
    want = float(
        np.where(d1 < thr, d1, 0.0).mean() + np.where(d2 < thr, d2, 0.0).mean()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lr_schedules():
    """StepLR + warmup-cosine schedules (reference pytorch_utils P7)."""
    from pytorch_points_tpu.utils import (
        step_lr_schedule,
        warmup_cosine_lr_schedule,
    )

    s = step_lr_schedule(1e-2, decay_steps=10, gamma=0.1, min_lr=1e-5)
    np.testing.assert_allclose(float(s(0)), 1e-2)
    np.testing.assert_allclose(float(s(9)), 1e-2)
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-5, rtol=1e-6)  # floor

    w = warmup_cosine_lr_schedule(1e-2, total_steps=100, warmup_steps=10)
    assert float(w(0)) == 0.0
    np.testing.assert_allclose(float(w(5)), 5e-3, rtol=1e-6)
    np.testing.assert_allclose(float(w(10)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(w(100)), 0.0, atol=1e-9)
    assert float(w(40)) > float(w(80))

    # drives an optax optimizer directly
    import optax

    tx = optax.adam(s)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    upd, _ = tx.update(g, state, params)
    assert np.all(np.isfinite(np.asarray(upd["w"])))


def test_render_points_ewa_normals(rng):
    """EWA ellipse splats: anisotropic footprints from oriented disks,
    gradients flow to normals (DSS surface splatting)."""
    import jax

    from pytorch_points_tpu.geo import Camera, render_points

    cam = Camera(eye=(0.0, 0.0, 3.0), focal=None, ortho_scale=1.2)
    pts = jnp.zeros((1, 1, 3), jnp.float32)

    # a camera-facing disk renders a (round) larger footprint than the
    # same disk edge-on (which collapses to the minimal-footprint sliver)
    n_face = jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32)
    n_edge = jnp.asarray([[[1.0, 0.0, 0.0]]], jnp.float32)
    img_f, a_f = render_points(pts, normals=n_face, camera=cam,
                               image_size=64, splat_radius=0.3)
    img_e, a_e = render_points(pts, normals=n_edge, camera=cam,
                               image_size=64, splat_radius=0.3)
    assert float(jnp.sum(a_f)) > 4 * float(jnp.sum(a_e))
    # face-on footprint is round: symmetric under x<->y
    np.testing.assert_allclose(
        np.asarray(a_f[0]), np.asarray(a_f[0]).T, atol=1e-5
    )

    # tilted disk: anisotropic (x extent < y extent for a y-axis-tilted
    # normal), and d(image)/d(normal) is finite and nonzero
    def loss(nrm):
        img, alpha = render_points(pts, normals=nrm, camera=cam,
                                   image_size=64, splat_radius=0.3)
        w = jnp.linspace(0, 1, 64)[None, :]  # x-weighted intensity
        return jnp.sum(alpha[0] * w)

    n_tilt = jnp.asarray([[[0.6, 0.0, 0.8]]], jnp.float32)
    g = jax.grad(loss)(n_tilt)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0

    _, a_t = render_points(pts, normals=n_tilt, camera=cam,
                           image_size=64, splat_radius=0.3)
    at = np.asarray(a_t[0])
    x_extent = (at.max(axis=0) > 0.5).sum()
    y_extent = (at.max(axis=1) > 0.5).sum()
    assert x_extent < y_extent  # squashed along the tilt axis

    # backface culling: a camera-away disk disappears under "soft"
    n_away = jnp.asarray([[[0.0, 0.0, -1.0]]], jnp.float32)
    _, a_b = render_points(pts, normals=n_away, camera=cam,
                           image_size=64, splat_radius=0.3, backface="soft")
    assert float(jnp.max(a_b)) < 0.01

    # isotropic path unchanged (regression guard)
    img0, a0 = render_points(pts, image_size=64, splat_radius=0.06)
    assert float(jnp.max(a0)) > 0.5


def test_render_points_ewa_perspective(rng):
    """Perspective EWA: nearer disks render larger; Jacobian branch has
    finite grads."""
    import jax

    from pytorch_points_tpu.geo import Camera, render_points

    cam = Camera(eye=(0.0, 0.0, 3.0), focal=1.5)
    near = jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32)  # z=1 -> depth 2
    far = jnp.asarray([[[0.0, 0.0, -1.5]]], jnp.float32)  # depth 4.5
    nrm = jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32)
    _, a_near = render_points(near, normals=nrm, camera=cam,
                              image_size=64, splat_radius=0.3)
    _, a_far = render_points(far, normals=nrm, camera=cam,
                             image_size=64, splat_radius=0.3)
    assert float(jnp.sum(a_near)) > 2 * float(jnp.sum(a_far))

    def loss(p):
        _, alpha = render_points(p, normals=nrm, camera=cam,
                                 image_size=32, splat_radius=0.3)
        return jnp.sum(alpha)

    g = jax.grad(loss)(near)
    assert np.all(np.isfinite(np.asarray(g)))


def test_export_roundtrip_fn(tmp_path, rng):
    """jax.export serving artifact: ops serialize and reload bitwise."""
    import jax.numpy as jnp

    from pytorch_points_tpu.ops import chamfer_distance
    from pytorch_points_tpu.utils import export_fn, load_exported

    p = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, 48, 3)), jnp.float32)
    path = tmp_path / "chamfer.stablehlo"
    export_fn(lambda a, b: chamfer_distance(a, b), (p, q), path=str(path))
    restored = load_exported(str(path))
    np.testing.assert_array_equal(
        np.asarray(restored(p, q)), np.asarray(chamfer_distance(p, q))
    )


def test_export_forward_model_baked_weights(tmp_path, rng):
    """A trained nnx model exports with weights baked in and reproduces
    its forward exactly after reload from disk."""
    import jax.numpy as jnp
    from flax import nnx

    from pytorch_points_tpu.models import PointCloudAutoencoder
    from pytorch_points_tpu.utils import export_forward, load_exported

    model = PointCloudAutoencoder(npoint1=32, npoint2=8, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    want = model(x)  # eager: jit fusion may differ in the last ulp
    path = tmp_path / "ae.stablehlo"
    export_forward(model, x, path=str(path))
    got = load_exported(str(path))(x)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_torch_bridge(rng):
    """torch <-> jax conversion + reference Conv1d/BN weight import into
    SharedMLP: the jitted SharedMLP must reproduce the torch conv stack."""
    torch = pytest.importorskip("torch")
    import jax as _jax
    from flax import nnx

    from pytorch_points_tpu.compat import torch_bridge as tb
    from pytorch_points_tpu.layers import SharedMLP

    # array conversion with layout flips
    t = torch.randn(2, 3, 16)  # reference [B, C, N]
    a = tb.to_jax(t, channels_last=True)
    assert a.shape == (2, 16, 3)
    back = tb.from_jax(a, channels_first=True)
    assert back.shape == (2, 3, 16)
    np.testing.assert_allclose(back.numpy(), t.numpy(), rtol=1e-6)

    # weight import: torch 1x1-conv + BN stack == SharedMLP(norm="batch")
    torch.manual_seed(0)
    convs = [torch.nn.Conv1d(3, 8, 1), torch.nn.Conv1d(8, 4, 1)]
    bns = [torch.nn.BatchNorm1d(8), torch.nn.BatchNorm1d(4)]
    with torch.no_grad():
        for bn in bns:
            bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(); bn.bias.normal_()

    mlp = SharedMLP([3, 8, 4], norm="batch", rngs=nnx.Rngs(0))
    tb.load_shared_mlp_from_torch(
        mlp,
        [c.weight for c in convs],
        [c.bias for c in convs],
        [{"weight": bn.weight, "bias": bn.bias,
          "running_mean": bn.running_mean,
          "running_var": bn.running_var} for bn in bns],
    )
    mlp.eval()  # use imported running stats

    x = rng.standard_normal((2, 16, 3)).astype(np.float32)
    # The oracle is torch f32; run the jax side at full matmul precision
    # so the comparison tests weight IMPORT, not TPU bf16 rounding.
    with _jax.default_matmul_precision("highest"):
        got = np.asarray(_jax.jit(mlp)(jnp.asarray(x)))

    xt = torch.from_numpy(np.swapaxes(x, 1, 2))  # [B, C, N]
    with torch.no_grad():
        h = xt
        for c, bn in zip(convs, bns):
            bn.eval()
            h = torch.relu(bn(c(h)))
    want = np.swapaxes(h.numpy(), 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # act_last=False (conv-bn-relu...conv head): one BN state per REAL
    # norm layer imports cleanly
    head = SharedMLP([3, 8, 4], norm="batch", act_last=False,
                     rngs=nnx.Rngs(0))
    tb.load_shared_mlp_from_torch(
        head,
        [c.weight for c in convs],
        [c.bias for c in convs],
        [{"weight": bns[0].weight, "bias": bns[0].bias,
          "running_mean": bns[0].running_mean,
          "running_var": bns[0].running_var}],
    )
    head.eval()
    with _jax.default_matmul_precision("highest"):
        got2 = np.asarray(_jax.jit(head)(jnp.asarray(x)))
    with torch.no_grad():
        h2 = convs[1](torch.relu(bns[0](convs[0](xt))))
    np.testing.assert_allclose(
        got2, np.swapaxes(h2.numpy(), 1, 2), rtol=1e-4, atol=1e-5
    )
