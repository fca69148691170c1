import jax
import jax.numpy as jnp
import numpy as np

import oracles
from pytorch_points_tpu.ops import (
    furthest_point_sample,
    furthest_point_sample_and_gather,
    gather_points,
)


def test_fps_matches_oracle(rng):
    xyz = rng.standard_normal((4, 257, 3), dtype=np.float32)
    idx = furthest_point_sample(xyz, 64)
    want = oracles.furthest_point_sample(xyz, 64)
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_fps_large_index_identical(rng):
    xyz = rng.standard_normal((2, 2048, 3), dtype=np.float32)
    idx = furthest_point_sample(xyz, 256)
    want = oracles.furthest_point_sample(xyz, 256)
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_fps_masked(rng):
    xyz = rng.standard_normal((3, 100, 3), dtype=np.float32)
    mask = np.ones((3, 100), bool)
    mask[:, 60:] = False
    mask[1, 0] = False  # first point invalid: seeding must skip it
    idx = furthest_point_sample(xyz, 32, mask=mask)
    want = oracles.furthest_point_sample(xyz, 32, mask=mask)
    np.testing.assert_array_equal(np.asarray(idx), want)
    assert np.all(np.asarray(idx) < 60)
    assert np.asarray(idx)[1, 0] == 1


def test_fps_padding_invariance(rng):
    xyz = rng.standard_normal((2, 80, 3), dtype=np.float32)
    pad = np.concatenate([xyz, rng.standard_normal((2, 48, 3), np.float32)], 1)
    mask = np.zeros((2, 128), bool)
    mask[:, :80] = True
    idx_pad = furthest_point_sample(pad, 16, mask=mask)
    idx = furthest_point_sample(xyz, 16)
    np.testing.assert_array_equal(np.asarray(idx_pad), np.asarray(idx))


def test_gather_points_and_grad(rng):
    feats = rng.standard_normal((2, 50, 7), dtype=np.float32)
    idx = rng.integers(0, 50, size=(2, 20)).astype(np.int32)
    out = gather_points(feats, idx)
    want = np.stack([feats[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    def loss(f):
        return jnp.sum(gather_points(f, idx) ** 2)

    g = jax.grad(loss)(jnp.asarray(feats))
    # oracle: scatter-add of 2*gathered
    want_g = np.zeros_like(feats)
    for b in range(2):
        for j, i in enumerate(idx[b]):
            want_g[b, i] += 2 * want[b, j]
    np.testing.assert_allclose(np.asarray(g), want_g, atol=1e-5, rtol=1e-5)


def test_fps_and_gather(rng):
    xyz = rng.standard_normal((2, 64, 3), dtype=np.float32)
    new_xyz, idx = furthest_point_sample_and_gather(xyz, 8)
    want_idx = oracles.furthest_point_sample(xyz, 8)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    want = np.stack([xyz[b][want_idx[b]] for b in range(2)])
    np.testing.assert_allclose(np.asarray(new_xyz), want, rtol=1e-6)


def test_fps_first_index_large_coordinates(rng):
    """Seeding must not depend on coordinate magnitude (ADVICE r2): the
    first selection is the lowest valid index even when |coords| ~ 1e5."""
    xyz = (rng.standard_normal((2, 300, 3)) * 1.2e5).astype(np.float32)
    idx = furthest_point_sample(xyz, 32)
    want = oracles.furthest_point_sample(xyz, 32)
    np.testing.assert_array_equal(np.asarray(idx), want)
    mask = np.ones((2, 300), bool)
    mask[:, :7] = False  # lowest valid index is 7
    idx_m = np.asarray(furthest_point_sample(xyz, 32, mask=mask))
    assert np.all(idx_m[:, 0] == 7)


def test_fps_emit_coords_bitwise_and_grads(rng):
    """The kernel-emitted centroid coordinates are bitwise equal to
    gather_points(xyz, idx) — masked and unmasked — and the fused path's
    xyz gradient equals the gather path's scatter-add."""
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.kernels import fps as fps_kernel
    from pytorch_points_tpu.ops.sampling import gather_points

    xyz = rng.standard_normal((3, 192, 3), dtype=np.float32)
    idx, coords = fps_kernel.furthest_point_sample(
        jnp.asarray(xyz), 16, emit_coords=True
    )
    np.testing.assert_array_equal(
        np.asarray(coords), np.asarray(gather_points(xyz, idx))
    )
    mask = np.ones((3, 192), bool)
    mask[:, 150:] = False
    idx_m, coords_m = fps_kernel.furthest_point_sample(
        jnp.asarray(xyz), 16, mask=jnp.asarray(mask), emit_coords=True
    )
    np.testing.assert_array_equal(
        np.asarray(coords_m), np.asarray(gather_points(xyz, idx_m))
    )

    def fused(x):
        new_xyz, _ = furthest_point_sample_and_gather(x, 16)
        return jnp.sum(new_xyz ** 2)

    def gathered(x):
        from pytorch_points_tpu.ops.sampling import furthest_point_sample

        i = furthest_point_sample(x, 16)
        return jnp.sum(gather_points(x, i) ** 2)

    g_f = jax.grad(fused)(jnp.asarray(xyz))
    g_g = jax.grad(gathered)(jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_g), rtol=1e-6)
