"""Confirm endgame_pop_cap=768 as the default: quality on ALL three
bench distributions + repeated timing (EMD runtime is data-dependent and
the first probe's 'default' 84.8 ms looked anomalous vs bench's 53.2).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytorch_points_tpu as ppt
from pytorch_points_tpu.utils.benchmark import measure
from scipy.optimize import linear_sum_assignment


def excess(f, pa, qa):
    got = np.asarray(f(jnp.asarray(pa), jnp.asarray(qa)), np.float64)
    exc = []
    for bi in range(len(pa)):
        d2 = ((pa[bi, :, None, :].astype(np.float64)
               - qa[bi, None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        opt = d2[r, c].mean()
        exc.append(100.0 * (got[bi].mean() - opt) / opt)
    return np.mean(exc), np.min(exc), np.max(exc)


def main():
    qrng = np.random.default_rng(7)
    nb = 8

    def gmm(b, npts, k=8, spread=0.15):
        centers = qrng.uniform(-1, 1, (b, k, 3))
        which = qrng.integers(0, k, (b, npts))
        return (centers[np.arange(b)[:, None], which]
                + spread * qrng.standard_normal((b, npts, 3))
                ).astype(np.float32)

    normal = lambda b, n: qrng.standard_normal((b, n, 3)).astype(np.float32)
    # correlated train-step pairs: q = small perturbation of p
    def correlated(b, n):
        p = qrng.standard_normal((b, n, 3)).astype(np.float32)
        return p, (p + 0.05 * qrng.standard_normal((b, n, 3))
                   ).astype(np.float32)

    dists = {}
    dists["normal"] = (normal(nb, 2048), normal(nb, 2048))
    dists["gmm"] = (gmm(nb, 2048), gmm(nb, 2048))
    dists["correlated"] = correlated(nb, 2048)

    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
    q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
    pc = jnp.asarray(rng.standard_normal((16, 2048, 3)), jnp.float32)
    qc = pc + 0.05 * jnp.asarray(
        rng.standard_normal((16, 2048, 3)), jnp.float32)

    for name, kw in (("default", {}), ("pop768", {"endgame_pop_cap": 768}),
                     ("pop512", {"endgame_pop_cap": 512})):
        f = jax.jit(lambda p, q, kw=kw: ppt.earth_mover_distance(
            p, q, **kw)[0])
        t1 = measure(f, p4, q4) * 1e3
        t2 = measure(f, p4, q4) * 1e3
        tc = measure(f, pc, qc) * 1e3
        qual = {d: excess(f, *pq) for d, pq in dists.items()}
        qs = "  ".join(
            f"{d}: {m:.2f}[{lo:.2f},{hi:.2f}]"
            for d, (m, lo, hi) in qual.items())
        print(f"{name:8s} cfg4 {t1:6.1f}/{t2:6.1f} ms  corr16 {tc:6.1f} ms"
              f"  excess {qs}")


if __name__ == "__main__":
    main()
