import jax
import jax.numpy as jnp
import numpy as np

import oracles
from pytorch_points_tpu.ops import earth_mover_distance


def test_emd_is_permutation(rng):
    p = rng.standard_normal((3, 64, 3), dtype=np.float32)
    q = rng.standard_normal((3, 64, 3), dtype=np.float32)
    dist, assign = earth_mover_distance(p, q, eps=0.01, max_iters=200)
    a = np.asarray(assign)
    for b in range(3):
        assert sorted(a[b].tolist()) == list(range(64)), "not a permutation"
    # dist really is the matched squared distance
    want = np.stack(
        [np.sum((p[b] - q[b][a[b]]) ** 2, -1) for b in range(3)]
    )
    np.testing.assert_allclose(np.asarray(dist), want, atol=1e-5, rtol=1e-5)


def test_emd_near_optimal_tiny(rng):
    p = rng.standard_normal((4, 6, 3), dtype=np.float32)
    q = rng.standard_normal((4, 6, 3), dtype=np.float32)
    dist, assign = earth_mover_distance(p, q, eps=0.0005, max_iters=2000)
    cost = np.asarray(dist).sum(-1)
    opt, _ = oracles.emd_optimal(p, q)
    # auction with small eps: within n*eps of optimal
    assert np.all(cost <= opt + 6 * 0.0005 + 1e-4), (cost, opt)


def test_emd_identity(rng):
    """Identical clouds must match 1-1 with ~zero cost."""
    p = rng.standard_normal((2, 32, 3), dtype=np.float32)
    dist, assign = earth_mover_distance(p, p.copy(), eps=1e-4, max_iters=2000)
    cost = np.asarray(dist).sum(-1)
    assert np.all(cost < 1e-3), cost


def test_emd_grad_matched_pairs(rng):
    p = rng.standard_normal((1, 8, 3), dtype=np.float32)
    q = rng.standard_normal((1, 8, 3), dtype=np.float32)

    def loss(p, q):
        dist, _ = earth_mover_distance(p, q, eps=0.001, max_iters=500)
        return jnp.sum(dist)

    gp, gq = jax.grad(loss, argnums=(0, 1))(jnp.asarray(p), jnp.asarray(q))
    _, assign = earth_mover_distance(p, q, eps=0.001, max_iters=500)
    a = np.asarray(assign)[0]
    want_gp = 2 * (p[0] - q[0][a])
    np.testing.assert_allclose(np.asarray(gp)[0], want_gp, atol=1e-5, rtol=1e-5)
    want_gq = np.zeros_like(q[0])
    want_gq[a] = -want_gp
    np.testing.assert_allclose(np.asarray(gq)[0], want_gq, atol=1e-5, rtol=1e-5)


def test_emd_under_jit(rng):
    p = rng.standard_normal((2, 16, 3), dtype=np.float32)
    q = rng.standard_normal((2, 16, 3), dtype=np.float32)
    f = jax.jit(lambda p, q: earth_mover_distance(p, q, eps=0.01, max_iters=100))
    dist, assign = f(p, q)
    assert dist.shape == (2, 16)
    a = np.asarray(assign)
    for b in range(2):
        assert sorted(a[b].tolist()) == list(range(16))


def test_emd_vmap_of_grad(rng):
    p = rng.standard_normal((2, 1, 8, 3)).astype(np.float32)
    q = rng.standard_normal((2, 1, 8, 3)).astype(np.float32)

    def loss(p, q):
        dist, _ = earth_mover_distance(p, q, eps=0.01, max_iters=200, phases=1)
        return jnp.sum(dist)

    g = jax.vmap(jax.grad(loss))(jnp.asarray(p), jnp.asarray(q))
    assert g.shape == p.shape
    for i in range(2):
        gi = jax.grad(lambda pp: loss(pp, jnp.asarray(q[i])))(jnp.asarray(p[i]))
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(gi), atol=1e-6)


def test_auction_eps_cs_bound(rng):
    """The auction guarantees cost <= optimal + n*eps (eps-complementary
    slackness), even when the per-phase budget leaves stragglers — the
    residual kernel finishes them at the final eps (never greedily)."""
    from scipy.optimize import linear_sum_assignment

    n, eps = 96, 0.02
    p = rng.standard_normal((2, n, 3)).astype(np.float32)
    q = rng.standard_normal((2, n, 3)).astype(np.float32)
    # tiny budget: the main kernel cannot converge -> residual path taken.
    # impl="pallas": the guarantee belongs to the kernel path (the XLA
    # fallback is a correctness-only flat-eps loop with greedy completion).
    _, assign = earth_mover_distance(
        jnp.asarray(p), jnp.asarray(q), eps=eps, max_iters=2, phases=2,
        impl="pallas",
    )
    a = np.asarray(assign)
    for b in range(2):
        d2 = ((p[b, :, None, :] - q[b, None, :, :]) ** 2).sum(-1).astype(np.float64)
        r, c = linear_sum_assignment(d2)
        opt = d2[r, c].sum()
        cost = d2[np.arange(n), a[b]].sum()
        assert sorted(a[b].tolist()) == list(range(n))  # permutation
        assert cost <= opt + n * eps + 1e-3, (cost, opt, opt + n * eps)


def test_emd_operating_point_split():
    """The documented operating-point split must not silently drift:
    the raw op (and therefore the eval metrics) defaults to the
    assignment-fidelity endgame cap, EMDLoss to the training cap
    (bench/probe_r4_emdq3.py sets the numbers behind each)."""
    import inspect

    from pytorch_points_tpu.losses import EMDLoss

    sig = inspect.signature(earth_mover_distance)
    assert sig.parameters["endgame_pop_cap"].default == 768
    assert EMDLoss().endgame_pop_cap == 384
    # the trap must stay documented at the point of use (round-4 verdict
    # item 6): the training default's measured worst case on uncorrelated
    # clouds exceeds the 5% bar, and the docstring must say so.
    doc = EMDLoss.__doc__
    assert "+5.03% max" in doc and "endgame_pop_cap=768" in doc


def test_emd_warm_start_quality_tiny(rng):
    """Column-reduction warm start (default) must preserve the eps-CS
    near-optimality contract; cold start stays available and agrees.
    (Direct kernel call — interpret mode on CPU, compiled on TPU.)"""
    from pytorch_points_tpu.kernels.auction import auction_assignment

    from scipy.optimize import linear_sum_assignment

    p = rng.standard_normal((3, 32, 3), dtype=np.float32)
    q = rng.standard_normal((3, 32, 3), dtype=np.float32)
    opt = []
    for b in range(3):
        d2 = ((p[b][:, None, :] - q[b][None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        opt.append(d2[r, c].sum())
    opt = np.asarray(opt)
    for warm in (True, False):
        a = np.asarray(
            auction_assignment(p, q, 0.0005, 2000, warm_start=warm)
        )
        for b in range(3):
            assert sorted(a[b].tolist()) == list(range(32))
        cost = np.stack(
            [np.sum((p[b] - q[b][a[b]]) ** 2) for b in range(3)]
        )
        assert np.all(cost <= opt + 32 * 0.0005 + 1e-4), (warm, cost, opt)
