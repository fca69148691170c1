"""EMD quality knob sweep: config4's normal-cloud excess is 3.2% mean /
5.03% max over the Hungarian optimum with default knobs — probe whether a
modest budget bump buys the max under 5% and what it costs at the graded
B=32 N=2048 config.  (gmm/correlated are already at +0.15/+0.23%.)
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


def main():
    rng = np.random.default_rng(0)
    p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
    q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)

    qrng = np.random.default_rng(7)
    nb = 8
    pa = qrng.standard_normal((nb, 2048, 3)).astype(np.float32)
    qa = qrng.standard_normal((nb, 2048, 3)).astype(np.float32)
    opts = []
    for bi in range(nb):
        d2 = ((pa[bi, :, None, :].astype(np.float64)
               - qa[bi, None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        opts.append(d2[r, c].mean())

    configs = [
        ("default", {}),
        ("iters20", {"max_iters": 20}),
        ("phases4", {"phases": 4}),
        ("iters20_phases4", {"max_iters": 20, "phases": 4}),
        ("pop768", {"endgame_pop_cap": 768}),
        ("iters25", {"max_iters": 25}),
    ]
    for name, kw in configs:
        f = jax.jit(lambda p, q: ppt.earth_mover_distance(p, q, **kw)[0])
        ms = measure(f, p4, q4) * 1e3
        got = np.asarray(f(jnp.asarray(pa), jnp.asarray(qa)), np.float64)
        exc = [100.0 * (got[bi].mean() - opts[bi]) / opts[bi]
               for bi in range(nb)]
        print(f"{name:18s} {ms:7.1f} ms  excess mean {np.mean(exc):5.2f}"
              f"  min {np.min(exc):5.2f}  max {np.max(exc):5.2f}")


if __name__ == "__main__":
    main()
