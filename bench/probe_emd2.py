"""EMD probe 2: Gauss-Seidel kernel — quality/time/unassigned-count."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

import pytorch_points_tpu as ppt
from pytorch_points_tpu.kernels import auction
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 2048

pu = rng.standard_normal((B, N, 3)).astype(np.float32)
qu = rng.standard_normal((B, N, 3)).astype(np.float32)


def gmm(rng, b, n, k=8, spread=0.15):
    centers = rng.uniform(-1, 1, (b, k, 3))
    which = rng.integers(0, k, (b, n))
    pts = centers[np.arange(b)[:, None], which] + spread * rng.standard_normal((b, n, 3))
    return pts.astype(np.float32)


pc = gmm(rng, B, N)
qc = gmm(rng, B, N)


def optimal_mean_d2(p, q, nb=2):
    tot = []
    for b in range(nb):
        d2 = ((p[b, :, None, :] - q[b, None, :, :]) ** 2).sum(-1).astype(np.float64)
        r, c = linear_sum_assignment(d2)
        tot.append(d2[r, c].mean())
    return float(np.mean(tot))


for name, p, q in [("uniform", pu, qu), ("clustered", pc, qc)]:
    opt = optimal_mean_d2(p, q)
    print(f"--- {name}: optimal mean d2 = {opt:.5f}", flush=True)
    pj, qj = jnp.asarray(p), jnp.asarray(q)
    for kw in [
        dict(eps=0.005, max_iters=5, phases=2),
        dict(eps=0.005, max_iters=10, phases=2),
        dict(eps=0.005, max_iters=10, phases=3),
        dict(eps=0.005, max_iters=20, phases=3),
        dict(eps=0.005, max_iters=30, phases=4),
        dict(eps=0.01, max_iters=10, phases=3),
    ]:
        f = jax.jit(lambda a, b, kw=kw: ppt.earth_mover_distance(a, b, **kw)[0])
        t = measure(f, pj, qj, iters=3)
        got = float(jnp.mean(f(pj, qj)[:2]))
        un = auction.auction_unassigned_count(pj, qj, **kw)
        print(
            f"  {str(kw):50s} {t*1e3:7.1f} ms   mean_d2={got:.5f} (+{100*(got-opt)/opt:5.1f}%)"
            f"  unassigned max={int(jnp.max(un))} mean={float(jnp.mean(un)):.1f}",
            flush=True,
        )
