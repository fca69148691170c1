import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from pytorch_points_tpu.ops import chamfer_distance, nndistance


def make_clouds(rng, b=4, n=129, m=95):
    p = rng.standard_normal((b, n, 3), dtype=np.float32)
    q = rng.standard_normal((b, m, 3), dtype=np.float32)
    return p, q


def test_nndistance_matches_oracle(rng):
    p, q = make_clouds(rng)
    d1, i1, d2, i2 = jax.jit(nndistance)(p, q)
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_array_equal(np.asarray(i2), oi2)
    np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-5, rtol=1e-5)


def test_nndistance_grad_matches_autodiff(rng):
    """custom_vjp grads == autodiff through a direct differentiable min."""
    p, q = make_clouds(rng, b=2, n=33, m=41)

    def loss_custom(p, q):
        d1, _, d2, _ = nndistance(p, q)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    def loss_direct(p, q):
        d = jnp.sum((p[:, :, None, :] - q[:, None, :, :]) ** 2, -1)
        return jnp.sum(jnp.min(d, -1)) + 0.5 * jnp.sum(jnp.min(d, -2))

    gp, gq = jax.grad(loss_custom, argnums=(0, 1))(p, q)
    gp2, gq2 = jax.grad(loss_direct, argnums=(0, 1))(p, q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp2), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq2), atol=1e-4, rtol=1e-4)


def test_nndistance_mask_invariance(rng):
    """Padding must not change results for the valid points (SURVEY §5.3)."""
    p, q = make_clouds(rng, b=2, n=40, m=30)
    pad_p = np.concatenate([p, rng.standard_normal((2, 24, 3), dtype=np.float32)], 1)
    pad_q = np.concatenate([q, rng.standard_normal((2, 10, 3), dtype=np.float32)], 1)
    p_mask = np.zeros((2, 64), bool)
    p_mask[:, :40] = True
    q_mask = np.zeros((2, 40), bool)
    q_mask[:, :30] = True
    d1, i1, d2, i2 = nndistance(pad_p, pad_q, p_mask, q_mask)
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1)[:, :40], oi1)
    np.testing.assert_allclose(np.asarray(d1)[:, :40], od1, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2)[:, :30], oi2)
    np.testing.assert_allclose(np.asarray(d2)[:, :30], od2, atol=1e-5, rtol=1e-5)
    # padded outputs are zeroed
    assert np.all(np.asarray(d1)[:, 40:] == 0)
    assert np.all(np.asarray(i1)[:, 40:] == 0)


def test_masked_points_get_zero_grad(rng):
    p, q = make_clouds(rng, b=2, n=16, m=16)
    p_mask = np.zeros((2, 16), bool)
    p_mask[:, :10] = True

    def loss(p):
        return chamfer_distance(p, q, p_mask=p_mask)

    g = jax.grad(loss)(jnp.asarray(p))
    assert np.all(np.asarray(g)[:, 10:] == 0)
    assert np.any(np.asarray(g)[:, :10] != 0)


def test_chamfer_distance_reductions(rng):
    p, q = make_clouds(rng, b=2, n=16, m=24)
    od1, _, od2, _ = oracles.nndistance(p, q)
    want = np.mean(od1.mean(-1) + od2.mean(-1))
    got = chamfer_distance(p, q)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    one = chamfer_distance(p, q, one_sided=True)
    np.testing.assert_allclose(float(one), np.mean(od1.mean(-1)), rtol=1e-5)


def test_nndistance_vmap(rng):
    """ops compose with vmap (an extra leading axis)."""
    p = rng.standard_normal((2, 3, 17, 3), dtype=np.float32)
    q = rng.standard_normal((2, 3, 13, 3), dtype=np.float32)
    d1, i1, _, _ = jax.vmap(nndistance)(p, q)
    for i in range(2):
        od1, oi1, _, _ = oracles.nndistance(p[i], q[i])
        np.testing.assert_array_equal(np.asarray(i1[i]), oi1)
        np.testing.assert_allclose(np.asarray(d1[i]), od1, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n,m", [(1, 1), (1, 7), (130, 1)])
def test_nndistance_tiny_shapes(rng, n, m):
    p, q = make_clouds(rng, b=1, n=n, m=m)
    d1, i1, d2, i2 = nndistance(p, q)
    od1, oi1, od2, oi2 = oracles.nndistance(p, q)
    np.testing.assert_array_equal(np.asarray(i1), oi1)
    np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-5, rtol=1e-5)


def test_vmap_of_grad(rng):
    """vmap(grad(chamfer)) — extra leading dims through the scatter bwd."""
    p = rng.standard_normal((3, 2, 20, 3)).astype(np.float32)
    q = rng.standard_normal((3, 2, 24, 3)).astype(np.float32)
    g = jax.vmap(jax.grad(lambda p, q: chamfer_distance(p, q)))(
        jnp.asarray(p), jnp.asarray(q)
    )
    assert g.shape == p.shape
    for i in range(3):
        gi = jax.grad(lambda p: chamfer_distance(p, q[i]))(jnp.asarray(p[i]))
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(gi), atol=1e-6)
