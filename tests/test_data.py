import numpy as np

from pytorch_points_tpu.data import BucketedBatcher, PlyFolderDataset, random_clouds
from pytorch_points_tpu.utils import pc_utils


def test_bucketed_batcher_shapes_and_masks():
    ds = random_clouds(30, lo=100, hi=900, seed=1)
    batcher = BucketedBatcher(ds, batch_size=4, multiple=128, max_buckets=3,
                              shuffle=True)
    shapes = set()
    total = 0
    for batch in batcher:
        pts, mask = batch["points"], batch["mask"]
        assert pts.shape[:2] == mask.shape
        assert pts.shape[1] in batcher.buckets
        shapes.add(pts.shape[1])
        # padded region is zero and masked out
        assert np.all(pts[~mask] == 0)
        total += int(mask.any(-1).sum())
    assert total == 30  # every cloud delivered exactly once
    assert len(shapes) <= 3


def test_bucketed_batcher_masks_match_sizes():
    ds = random_clouds(10, lo=50, hi=200, seed=2)
    sizes = {c.shape[0] for c in ds}
    batcher = BucketedBatcher(ds, batch_size=2, multiple=64, shuffle=False)
    seen = []
    for batch in batcher:
        seen.extend(int(m.sum()) for m in batch["mask"] if m.any())
    assert sorted(seen) == sorted(c.shape[0] for c in ds)
    assert sizes  # sanity


def test_ply_folder_dataset(tmp_path, rng):
    for i in range(3):
        pc_utils.save_ply(
            rng.standard_normal((50 + i * 10, 3)).astype(np.float32),
            tmp_path / f"c{i}.ply",
        )
    ds = PlyFolderDataset(str(tmp_path))
    assert len(ds) == 3
    x = ds[0]
    assert x.shape[1] == 3
    # normalized to unit sphere
    assert np.linalg.norm(x, axis=-1).max() <= 1 + 1e-5


def test_prefetcher_overlaps_and_matches(rng):
    """Prefetcher yields the same batches as direct iteration, re-raises
    producer exceptions, and is re-iterable."""
    from pytorch_points_tpu.data import BucketedBatcher, Prefetcher, random_clouds

    ds = random_clouds(10, lo=100, hi=300, seed=1)
    batcher = BucketedBatcher(ds, batch_size=3, multiple=64, shuffle=False)
    direct = list(batcher)
    pre = list(Prefetcher(batcher, depth=2))
    assert len(direct) == len(pre)
    for a, b in zip(direct, pre):
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["mask"], b["mask"])

    # re-iterable
    again = list(Prefetcher(batcher, depth=1))
    assert len(again) == len(direct)

    # producer exceptions surface at the consumer
    def bad():
        yield {"x": 1}
        raise ValueError("boom")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        list(Prefetcher(bad(), depth=1))


def test_prefetcher_abandoned_iteration_releases_producer():
    """Breaking out of a Prefetcher pass must terminate the producer
    thread (it previously blocked forever on a full queue)."""
    import threading
    import time

    from pytorch_points_tpu.data import Prefetcher

    produced = []

    def many():
        for i in range(1000):
            produced.append(i)
            yield {"i": i}

    before = threading.active_count()
    for batch in Prefetcher(many(), depth=1):
        if batch["i"] >= 2:
            break  # abandon mid-pass with the queue full
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # producer stopped early, not drained


def test_augment_ops(rng):
    """Keyed on-device augmentation: jit-compatible, mask-respecting,
    rotation preserves lengths, dropout never empties a cloud."""
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.data import augment

    x = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    mask = jnp.asarray(np.arange(64)[None] < 48).repeat(4, 0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    j = jax.jit(lambda k, x: augment.jitter(k, x, mask=mask))(k1, x)
    assert np.abs(np.asarray(j - x)).max() <= 0.05 + 1e-6
    assert np.array_equal(np.asarray(j)[:, 48:], np.asarray(x)[:, 48:])

    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 64, 1))
    r, rn = jax.jit(lambda k, x, n: augment.rotate(k, x, n))(k2, x, nrm)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rn), axis=-1), 1.0, rtol=1e-5
    )
    # y-axis rotation preserves the y component
    np.testing.assert_allclose(
        np.asarray(r)[..., 1], np.asarray(x)[..., 1], atol=1e-6
    )

    s = jax.jit(lambda k, x: augment.random_scale(k, x))(k3, x)
    ratio = np.asarray(s) / np.asarray(x)
    per_cloud = ratio.reshape(4, -1)
    assert np.allclose(per_cloud, per_cloud[:, :1], rtol=1e-5)
    assert (per_cloud[:, 0] >= 0.8 - 1e-6).all()
    assert (per_cloud[:, 0] <= 1.25 + 1e-6).all()

    _, keep = jax.jit(
        lambda k, x: augment.random_dropout(k, x, max_ratio=0.9, mask=mask)
    )(k4, x)
    keep = np.asarray(keep)
    assert (~keep[:, 48:]).all()          # invalid stays invalid
    assert keep.any(axis=1).all()         # never empties a cloud
    assert keep.sum() < np.asarray(mask).sum()  # actually drops something


def test_voxel_downsample_mask(rng):
    """Device voxel downsample: exactly one representative per occupied
    voxel, always the lowest valid index; invalid points stay invalid."""
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.ops import voxel_downsample_mask

    x = rng.uniform(-1, 1, (3, 256, 3)).astype(np.float32)
    mask = np.ones((3, 256), bool)
    mask[:, 200:] = False
    keep = np.asarray(jax.jit(
        lambda x, m: voxel_downsample_mask(x, 0.25, mask=m)
    )(jnp.asarray(x), jnp.asarray(mask)))

    assert not keep[:, 200:].any()
    for b in range(3):
        lo = x[b, :200].min(axis=0)
        g = np.floor((x[b] - lo) / 0.25).astype(np.int64)
        key = (g[:, 0] << 20) | (g[:, 1] << 10) | g[:, 2]
        first = {}
        for i in range(200):
            first.setdefault(key[i], i)
        want = np.zeros(256, bool)
        want[list(first.values())] = True
        np.testing.assert_array_equal(keep[b], want)

    # composes with masked ops: a downsampled cloud still FPS-samples
    from pytorch_points_tpu.ops import furthest_point_sample

    idx = furthest_point_sample(jnp.asarray(x), 16, mask=jnp.asarray(keep))
    assert keep[np.arange(3)[:, None], np.asarray(idx)].all()
