import jax
import jax.numpy as jnp
import numpy as np

import oracles
from pytorch_points_tpu.ops import (
    interpolation_weights,
    three_interpolate,
    three_nn,
)


def test_three_nn_matches_oracle(rng):
    hi = rng.standard_normal((2, 40, 3), dtype=np.float32)
    lo = rng.standard_normal((2, 12, 3), dtype=np.float32)
    dist, idx = three_nn(hi, lo)
    odist, oidx = oracles.three_nn(hi, lo)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(dist), odist, atol=1e-5, rtol=1e-5)


def test_three_interpolate_matches_oracle(rng):
    feats = rng.standard_normal((2, 12, 5), dtype=np.float32)
    idx = rng.integers(0, 12, size=(2, 40, 3)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=(2, 40, 3)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    out = three_interpolate(feats, idx, w)
    want = oracles.three_interpolate(feats, idx, w)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


def test_three_interpolate_grads(rng):
    """custom_vjp grads vs autodiff through the direct jnp formulation."""
    feats = rng.standard_normal((1, 8, 4), dtype=np.float32)
    idx = rng.integers(0, 8, size=(1, 10, 3)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=(1, 10, 3)).astype(np.float32)

    def loss_custom(f, w):
        return jnp.sum(three_interpolate(f, idx, w) ** 2)

    def loss_direct(f, w):
        gathered = jnp.stack(
            [f[0, idx[0, :, j], :] * w[0, :, j, None] for j in range(3)]
        ).sum(0)
        return jnp.sum(gathered**2)

    gf, gw = jax.grad(loss_custom, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gf2, gw2 = jax.grad(loss_direct, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf2), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2), atol=1e-5, rtol=1e-5)


def test_interpolation_weights_normalized(rng):
    d = rng.uniform(0.0, 2.0, size=(2, 10, 3)).astype(np.float32)
    w = interpolation_weights(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)
    # nearest point gets the largest weight
    assert np.all(
        np.argmax(np.asarray(w), -1) == np.argmin(d, -1)
    )
