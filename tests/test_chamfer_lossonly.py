"""Loss-only sorted chamfer (ops/chamfer.py::_chamfer_sums_sorted).

The mean/sum chamfer_distance path drops the tie-break payload and the
un-permute scatters of the indexed kernel; the indexed path is the
correctness ORACLE.  Contract (round-3 verdict item 1): loss equal to
float tolerance (sum order moves low bits), gradients equal up to exact
ties — with random clouds ties have measure zero, so grads here must
match to float tolerance too.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_points_tpu.kernels import dispatch
from pytorch_points_tpu.ops import chamfer as chamfer_mod
from pytorch_points_tpu.ops import chamfer_distance


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    dispatch.force_impl("pallas")
    monkeypatch.setattr(chamfer_mod, "_SORTED_MIN_POINTS", 256)
    yield
    dispatch.force_impl(None)


def _indexed_loss(p, q, reduction="mean", one_sided=False):
    """The indexed-path oracle: same reduction arithmetic, via nndistance."""
    from pytorch_points_tpu.ops.chamfer import nndistance

    d1, _, d2, _ = nndistance(p, q)
    l1 = jnp.mean(d1, -1) if reduction == "mean" else jnp.sum(d1, -1)
    l2 = jnp.mean(d2, -1) if reduction == "mean" else jnp.sum(d2, -1)
    return jnp.mean(l1) if one_sided else jnp.mean(l1 + l2)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
@pytest.mark.parametrize("n,m", [(512, 512), (600, 384)])
def test_lossonly_matches_indexed(rng, reduction, n, m):
    p = jnp.asarray(rng.uniform(-1, 1, (2, n, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, m, 3)), jnp.float32)
    assert chamfer_mod._use_sorted_path(p, q, None, None, "auto")

    f_new = jax.value_and_grad(
        lambda p, q: chamfer_distance(p, q, reduction=reduction), (0, 1)
    )
    f_ref = jax.value_and_grad(
        lambda p, q: _indexed_loss(p, q, reduction), (0, 1)
    )
    v_n, (gp_n, gq_n) = f_new(p, q)
    v_r, (gp_r, gq_r) = f_ref(p, q)
    np.testing.assert_allclose(float(v_n), float(v_r), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(gp_r)))
    np.testing.assert_allclose(np.asarray(gp_n), np.asarray(gp_r),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(gq_n), np.asarray(gq_r),
                               atol=1e-5 * scale)


def test_lossonly_one_sided(rng):
    p = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 384, 3)), jnp.float32)
    v_n = chamfer_distance(p, q, one_sided=True)
    v_r = _indexed_loss(p, q, one_sided=True)
    np.testing.assert_allclose(float(v_n), float(v_r), rtol=1e-6)


def test_lossonly_unequal_sizes_vs_xla(rng):
    """mean must normalize each direction by ITS cloud size (s1/N + s2/M)
    — the advisor-r3 shape-generality requirement — pinned against the
    dense XLA implementation on clearly unequal clouds."""
    p = jnp.asarray(rng.uniform(-1, 1, (2, 768, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 256, 3)), jnp.float32)
    v_n = chamfer_distance(p, q)
    dispatch.force_impl("xla")
    v_d = chamfer_distance(p, q)
    np.testing.assert_allclose(float(v_n), float(v_d), rtol=1e-6)


def test_path_telemetry(rng):
    from pytorch_points_tpu.ops.chamfer import chamfer_path

    p = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    assert chamfer_path(p, p, reduction="mean") == "sorted_loss"
    assert chamfer_path(p, p, reduction="sum") == "sorted_loss"
    assert chamfer_path(p, p, reduction="none") == "sorted"
    assert chamfer_path(p, p) == "sorted"
    mask = jnp.ones((2, 512), bool)
    assert chamfer_path(p, p, p_mask=mask, reduction="mean") == "sorted_masked"


def test_lossonly_ties_route_like_indexed(rng):
    """tie_orig=True means the loss-only kernel reports the LOWEST
    ORIGINAL index among exact ties — gradients must scatter to the same
    rows as the indexed path even with duplicated points."""
    base = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
    q = np.concatenate([base, base[:, :64]], axis=1)  # 64 exact twins
    p = jnp.asarray(rng.uniform(-1, 1, (1, 320, 3)), jnp.float32)
    q = jnp.asarray(q)

    f_new = jax.grad(lambda q: chamfer_distance(p, q))
    f_ref = jax.grad(lambda q: _indexed_loss(p, q))
    gq_n, gq_r = f_new(q), f_ref(q)
    scale = float(jnp.max(jnp.abs(gq_r)))
    np.testing.assert_allclose(np.asarray(gq_n), np.asarray(gq_r),
                               atol=1e-6 * max(scale, 1.0))


def test_reduction_none_uses_indexed(rng):
    """reduction='none' needs per-point rows in original order — it must
    keep riding the indexed path and agree with the dense kernel."""
    p = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)), jnp.float32)
    l1, l2 = chamfer_distance(p, q, reduction="none")
    dispatch.force_impl("xla")
    d1, _, d2, _ = chamfer_mod.nndistance(p, q)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(d1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(d2), atol=1e-6)
