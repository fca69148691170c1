"""Probe: refresh the pop-cap quality/time numbers under the (now
default) column-reduction warm start — the probe_r4_emdq2 sweep that set
the 768/384 operating-point split was measured with cold prices.

normal B=32 N=2048 (the config4 shape) and correlated train pairs B=16
(the config4c/config5 shape), pop_cap in {384, 768}.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flax import nnx
from scipy.optimize import linear_sum_assignment

from pytorch_points_tpu.kernels.auction import auction_assignment
from pytorch_points_tpu.models import PointCloudAutoencoder
from pytorch_points_tpu.utils.benchmark import measure

EPS = 0.005


def quality(pa, qa, assign, nb=8):
    exc = []
    for bi in range(nb):
        d2 = ((pa[bi, :, None, :].astype(np.float64)
               - qa[bi, None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        opt = d2[r, c].mean()
        got = d2[np.arange(d2.shape[0]), assign[bi]].mean()
        exc.append(100.0 * (got - opt) / opt)
    return float(np.mean(exc)), float(np.max(exc))


def main():
    qrng = np.random.default_rng(7)
    normal_p = qrng.standard_normal((32, 2048, 3)).astype(np.float32)
    normal_q = qrng.standard_normal((32, 2048, 3)).astype(np.float32)

    rng = np.random.default_rng(0)
    model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
    pred = jax.jit(model)(x)

    cases = [
        ("normal  B32", jnp.asarray(normal_p), jnp.asarray(normal_q)),
        ("correl  B16", pred, x),
    ]
    for name, p, q in cases:
        pa = np.asarray(p, np.float64)
        qa = np.asarray(q, np.float64)
        for pop in (384, 768):
            f = jax.jit(lambda a, b, pop=pop: auction_assignment(
                a, b, EPS, max_iters=15, phases=3, pop_cap=pop))
            assign = np.asarray(f(p, q))
            qm, qx = quality(pa, qa, assign)
            t = measure(f, p, q) * 1e3
            print(f"{name} pop{pop}: {t:6.1f} ms  "
                  f"excess mean {qm:.3f}% max {qx:.3f}%")


if __name__ == "__main__":
    main()
