import jax.numpy as jnp
import numpy as np

from pytorch_points_tpu.core import bucket_sizes, lengths_to_mask, pad_points, pad_to_bucket
from pytorch_points_tpu.ops import (
    batch_normals,
    normalize_point_batch,
    normalize_to_box,
)
from pytorch_points_tpu.ops.normals import smallest_eigenvector_sym3x3


def test_lengths_to_mask():
    m = lengths_to_mask(np.array([2, 4]), 5)
    want = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], bool)
    np.testing.assert_array_equal(np.asarray(m), want)


def test_pad_points_and_bucket(rng):
    x = rng.standard_normal((10, 3), dtype=np.float32)
    padded, mask = pad_points(x, 16)
    assert padded.shape == (16, 3)
    assert np.asarray(mask).sum() == 10
    np.testing.assert_allclose(np.asarray(padded)[:10], x)

    buckets = bucket_sizes([100, 300, 1000, 4000], multiple=256)
    assert all(b % 256 == 0 for b in buckets)
    assert max(buckets) >= 4000
    p2, m2 = pad_to_bucket(x, buckets)
    assert p2.shape[0] in buckets


def test_normalize_point_batch(rng):
    x = rng.standard_normal((2, 50, 3)).astype(np.float32) * 3 + 1
    out, centroid, furthest = normalize_point_batch(x)
    out = np.asarray(out)
    r = np.linalg.norm(out, axis=-1)
    assert np.all(r <= 1 + 1e-5)
    np.testing.assert_allclose(np.max(r, -1), 1.0, rtol=1e-5)
    # invertible
    rec = out * np.asarray(furthest) + np.asarray(centroid)
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_normalize_to_box(rng):
    x = rng.uniform(2, 7, size=(2, 40, 3)).astype(np.float32)
    out, center, scale = normalize_to_box(x)
    out = np.asarray(out)
    assert out.min() >= -1 - 1e-5 and out.max() <= 1 + 1e-5
    # longest edge spans exactly [-1, 1]
    extent = out.max(1) - out.min(1)
    np.testing.assert_allclose(extent.max(-1), 2.0, rtol=1e-5)


def test_smallest_eigenvector_vs_numpy(rng):
    a = rng.standard_normal((50, 3, 3)).astype(np.float32)
    cov = np.einsum("bij,bkj->bik", a, a)  # PSD symmetric
    v = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(cov)))
    w, vecs = np.linalg.eigh(cov)
    want = vecs[..., 0]  # smallest eigenvalue's eigenvector
    dots = np.abs(np.sum(v * want, -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_batch_normals_plane(rng):
    """Points on the z=0 plane must get +-z normals."""
    xy = rng.uniform(-1, 1, size=(1, 200, 2)).astype(np.float32)
    xyz = np.concatenate([xy, np.zeros((1, 200, 1), np.float32)], -1)
    n = np.asarray(batch_normals(xyz, k=16))
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-3)
    np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-3)
