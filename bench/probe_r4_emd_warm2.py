"""Probe: column-reduction warm start on the OTHER bench distributions
(normal + gmm at config4's B=32 N=2048, pop_cap=768) — the correlated
probe (probe_r4_emd_warm.py) showed warm+default-ladder wins there
(44.9 vs 46.0 ms, excess 0.185 vs 0.220%); flip the default only if it
ties-or-wins on all three distributions.
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

from scipy.optimize import linear_sum_assignment

from pytorch_points_tpu.kernels.auction import auction_assignment
from pytorch_points_tpu.utils.benchmark import measure

EPS = 0.005
POP = 768


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

    normal = lambda b, npts: qrng.standard_normal((b, npts, 3)).astype(
        np.float32
    )
    for name, maker in (("normal", normal), ("gmm", gmm)):
        pa, qa = maker(32, 2048), maker(32, 2048)
        p, q = jnp.asarray(pa), jnp.asarray(qa)
        for warm in (False, True):
            f = jax.jit(lambda a, b, w=warm: auction_assignment(
                a, b, EPS, max_iters=15, phases=3, pop_cap=POP,
                warm_start=w))
            assign = np.asarray(f(p, q))
            for bi in range(assign.shape[0]):
                assert sorted(assign[bi].tolist()) == list(range(2048))
            qm, qx = quality(pa.astype(np.float64), qa.astype(np.float64),
                             assign)
            t = measure(f, p, q) * 1e3
            print(f"{name:7s} warm={warm!s:5s}: {t:6.1f} ms  "
                  f"excess mean {qm:.3f}% max {qx:.3f}%")


if __name__ == "__main__":
    main()
