"""Probe: is the hardness-hint generous ladder still right under the
(now default) column-reduction warm start?

The auto-budget hint routes hard distributions (gmm, correlated) to
budgets (40, 25, ...) — tuned with COLD prices in round 3.  Warm prices
may let the default (15, 15, 15) ladder converge as well, cheaper.
Compares auto vs forced-default ladder on gmm B=32 and correlated B=16.
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

    def gmm(b, npts, k=8, spread=0.15):
        centers = qrng.standard_normal((b, k, 3)).astype(np.float32)
        which = qrng.integers(0, k, (b, npts))
        return (
            centers[np.arange(b)[:, None], which]
            + spread * qrng.standard_normal((b, npts, 3))
        ).astype(np.float32)

    rng = np.random.default_rng(0)
    model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
    pred = jax.jit(model)(x)

    gp, gq = gmm(32, 2048), gmm(32, 2048)
    cases = [
        ("gmm B32 pop768", jnp.asarray(gp), jnp.asarray(gq), 768),
        ("correl B16 pop384", pred, x, 384),
    ]
    ladders = [("auto", dict(auto_budget=True)),
               ("default15", dict(auto_budget=False)),
               ("mid25", dict(auto_budget=False, budgets=(25, 20, 15)))]
    for name, p, q, pop in cases:
        pa = np.asarray(p, np.float64)
        qa = np.asarray(q, np.float64)
        for lname, kw in ladders:
            f = jax.jit(lambda a, b, kw=kw, pop=pop: auction_assignment(
                a, b, EPS, max_iters=15, phases=3, pop_cap=pop, **kw))
            assign = np.asarray(f(p, q))
            for bi in range(assign.shape[0]):
                assert sorted(assign[bi].tolist()) == list(range(2048))
            qm, qx = quality(pa, qa, assign)
            t = measure(f, p, q) * 1e3
            print(f"{name} {lname:10s}: {t:6.1f} ms  "
                  f"excess mean {qm:.3f}% max {qx:.3f}%")


if __name__ == "__main__":
    main()
