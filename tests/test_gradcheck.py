"""Finite-difference gradient checks (SURVEY.md §5 tier 2).

Every other gradient test in the suite compares two *analytic* paths
(pallas custom_vjp vs XLA autodiff of the same formula) — a shared
analytic-backward bug would pass both.  This tier checks the custom_vjp
outputs against central finite differences of the forward value itself.

All ops force float32 internally, so the checks exploit that each loss is
locally *quadratic* in the coordinates once the argmin / assignment /
neighbor set is fixed: the central difference of a quadratic is exact up
to f32 rounding (~1e-7/eps), so eps=1e-3 gives ~1e-4 absolute FD noise on
O(1) values.  Fixed seeds keep the combinatorial structure (argmins,
assignments, ball memberships) stable under the probes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_points_tpu as ppt
from pytorch_points_tpu.ops.grouping import _bq_group_centered, group_points
from pytorch_points_tpu.ops.interpolate import (
    interpolation_weights,
    three_interpolate,
    three_nn,
)
from pytorch_points_tpu.ops.sampling import gather_points

EPS = 1e-3
ATOL = 5e-3
RTOL = 5e-3


def fd_grad(f, args, argnum, eps=EPS):
    """Per-coordinate central finite difference of scalar f wrt args[argnum]."""
    args = [np.asarray(a, np.float32) if i == argnum else a
            for i, a in enumerate(args)]
    x = args[argnum]
    flat = x.ravel()
    g = np.zeros_like(flat, dtype=np.float64)
    for i in range(flat.size):
        for sign in (+1.0, -1.0):
            xp = flat.copy()
            xp[i] += sign * eps
            a = list(args)
            a[argnum] = jnp.asarray(xp.reshape(x.shape))
            g[i] += sign * float(f(*a))
    return (g / (2 * eps)).reshape(x.shape)


def check_grad(f, args, argnum, atol=ATOL, rtol=RTOL, eps=EPS):
    ana = np.asarray(jax.grad(f, argnums=argnum)(*[jnp.asarray(a) for a in args]))
    num = fd_grad(f, list(args), argnum, eps=eps)
    np.testing.assert_allclose(ana, num, atol=atol, rtol=rtol)


@pytest.fixture
def clouds(rng):
    p = jnp.asarray(rng.uniform(-1, 1, (2, 8, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 6, 3)), jnp.float32)
    return p, q


def test_chamfer_grad_fd(clouds):
    p, q = clouds

    def f(p, q):
        return ppt.chamfer_distance(p, q)

    check_grad(f, (p, q), 0)
    check_grad(f, (p, q), 1)


def test_nndistance_weighted_grad_fd(clouds, rng):
    """Non-uniform cotangents through all four nndistance outputs."""
    p, q = clouds
    w1 = jnp.asarray(rng.uniform(0.5, 1.5, (2, 8)), jnp.float32)
    w2 = jnp.asarray(rng.uniform(0.5, 1.5, (2, 6)), jnp.float32)

    def f(p, q):
        d1, _, d2, _ = ppt.nndistance(p, q)
        return jnp.sum(d1 * w1) + jnp.sum(d2 * w2)

    check_grad(f, (p, q), 0)
    check_grad(f, (p, q), 1)


def test_emd_grad_fd(rng):
    p = jnp.asarray(rng.uniform(-1, 1, (2, 8, 3)), jnp.float32)
    q = jnp.asarray(p + 0.05 * rng.standard_normal((2, 8, 3)), jnp.float32)

    def f(p, q):
        d, _ = ppt.earth_mover_distance(p, q, eps=0.002, max_iters=200, phases=2)
        return jnp.mean(d)

    check_grad(f, (p, q), 0)
    check_grad(f, (p, q), 1)


def test_gather_points_grad_fd(rng):
    feat = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 10, (2, 7)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((2, 7, 4)), jnp.float32)

    def f(feat):
        return jnp.sum(gather_points(feat, idx) * w)

    check_grad(f, (feat,), 0)


def test_group_points_grad_fd(rng):
    feat = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 10, (2, 5, 3)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((2, 5, 3, 4)), jnp.float32)

    def f(feat):
        return jnp.sum(group_points(feat, idx) * w)

    check_grad(f, (feat,), 0)


def test_three_interpolate_grad_fd(rng):
    feat = jnp.asarray(rng.standard_normal((2, 6, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 6, (2, 9, 3)), jnp.int32)
    weight = jnp.asarray(rng.uniform(0.1, 1.0, (2, 9, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 9, 4)), jnp.float32)

    def f(feat, weight):
        return jnp.sum(three_interpolate(feat, idx, weight) * w)

    check_grad(f, (feat, weight), 0)
    check_grad(f, (feat, weight), 1)


def test_fp_chain_grad_fd(rng):
    """three_nn -> inverse-distance weights -> interpolate, grads wrt the
    low-res features (the chain the FP layer differentiates)."""
    hi = jnp.asarray(rng.uniform(-1, 1, (2, 9, 3)), jnp.float32)
    lo = jnp.asarray(rng.uniform(-1, 1, (2, 5, 3)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 9, 4)), jnp.float32)

    def f(feat):
        dist, idx = three_nn(hi, lo)
        weight = interpolation_weights(dist)
        return jnp.sum(three_interpolate(feat, idx, weight) * w)

    check_grad(f, (feat,), 0)


def test_fused_bq_group_grad_fd(rng):
    """The fused ball_query+centered-group custom_vjp (interpret mode on
    CPU) vs finite differences wrt both clouds."""
    xyz_np = rng.uniform(-1, 1, (2, 12, 3)).astype(np.float32)
    cen_np = rng.uniform(-1, 1, (2, 4, 3)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((2, 4, 5, 3)), jnp.float32)

    # Ball membership flips discontinuously when a probe pushes a point
    # across the radius — place the radius mid-gap in the sorted distance
    # distribution so every |d - r| margin is >> the FD step.
    d = np.sqrt(
        ((cen_np[:, :, None, :] - xyz_np[:, None, :, :]) ** 2).sum(-1)
    ).ravel()
    d.sort()
    mid = len(d) // 2
    gaps = d[mid : mid + 24]
    gi = int(np.argmax(np.diff(gaps)))
    radius = float((gaps[gi] + gaps[gi + 1]) / 2)
    assert min(abs(d - radius)) > 20 * EPS

    xyz, cen = jnp.asarray(xyz_np), jnp.asarray(cen_np)

    def f(xyz, cen):
        _, _, g = _bq_group_centered(xyz, cen, radius, 5)
        return jnp.sum(g * w)

    check_grad(f, (xyz, cen), 0)
    check_grad(f, (xyz, cen), 1)


def test_laplacian_losses_grad_fd(rng):
    from pytorch_points_tpu.losses import PointLaplacianLoss, RepulsionLoss

    x = jnp.asarray(rng.uniform(-1, 1, (2, 10, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 10, 3)), jnp.float32)

    lap = PointLaplacianLoss(k=4)
    check_grad(lambda a: lap(a, y), (x,), 0, atol=3e-2, rtol=3e-2)

    rep = RepulsionLoss(k=3, h=0.5)
    check_grad(lambda a: rep(a), (x,), 0, atol=3e-2, rtol=3e-2)  # sqrt/exp transcendentals: TPU f32 FD noise
