"""Probe: LAPJV-style column-reduction warm start for the auction EMD on
the REAL correlated train-step distribution (untrained autoencoder output
vs its uniform input — the config4c/config5 workload).

Hypothesis: with price[j] initialized to max_i benefit[i,j] (free fold
while the benefit cache fills), near-paired clouds settle in far fewer
auction iterations, possibly letting the coarse eps-scaling phases be
dropped entirely (the JV endgame already is an augmenting-path solver, so
warm prices + fine eps + endgame ~ LAPJV).

Quality oracle: scipy Hungarian on 8 elements, excess % of optimal.
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
POP = 384


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
    rng = np.random.default_rng(0)
    model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
    pred = jax.jit(model)(x)
    pa = np.asarray(pred, np.float64)
    qa = np.asarray(x, np.float64)

    variants = [
        ("base p3 i15 auto", dict(max_iters=15, phases=3)),
        ("warm p3 i15 auto", dict(max_iters=15, phases=3, warm_start=True)),
        ("cold p1 i30", dict(max_iters=30, phases=1)),
        ("warm p1 i30", dict(max_iters=30, phases=1, warm_start=True)),
        ("warm p1 i60", dict(max_iters=60, phases=1, warm_start=True)),
        ("warm p2 i15 auto", dict(max_iters=15, phases=2, warm_start=True)),
    ]
    for name, kw in variants:
        f = jax.jit(lambda a, b, kw=kw: auction_assignment(
            a, b, EPS, pop_cap=POP, **kw))
        assign = np.asarray(f(pred, x))
        for bi in range(assign.shape[0]):
            assert sorted(assign[bi].tolist()) == list(range(2048)), name
        qm, qx = quality(pa, qa, assign)
        t = measure(f, pred, x) * 1e3
        print(f"{name:20s}: {t:6.1f} ms  excess mean {qm:.3f}% max {qx:.3f}%")


if __name__ == "__main__":
    main()
