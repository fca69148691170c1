"""Tune (max_iters, phases, pop_cap): config4 time+quality, config5-style
EMD at B=16."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import functools

import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from pytorch_points_tpu.kernels import auction
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
pu = rng.standard_normal((32, 2048, 3)).astype(np.float32)
qu = rng.standard_normal((32, 2048, 3)).astype(np.float32)

opt = []
for b in range(2):
    d2 = ((pu[b, :, None, :] - qu[b, None, :, :]) ** 2).sum(-1).astype(np.float64)
    r, c = linear_sum_assignment(d2)
    opt.append(d2[r, c].mean())
opt = float(np.mean(opt))
print(f"optimal mean d2 = {opt:.5f}", flush=True)

pj, qj = jnp.asarray(pu), jnp.asarray(qu)


def run(p, q, it, ph, cap):
    owner, price, pp, qp = auction._auction_owner(p, q, 0.005, it, 256, ph, 6.0)
    owner = auction._residual_rounds(owner, price, pp, qp, 0.005, p.shape[1],
                                     pop_cap=cap)
    b, n_pad = owner.shape
    assign_full = jnp.full((b, n_pad + 1), 2**30, jnp.int32)
    slot = jnp.where(owner >= 0, owner, n_pad)
    assign_full = assign_full.at[jnp.arange(b)[:, None], slot].set(
        jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32), (b, n_pad))
    )
    assign = assign_full[:, : p.shape[1]]
    qsel = jnp.take_along_axis(q, assign[..., None], axis=1)
    return jnp.sum((p - qsel) ** 2, axis=-1)


for it, ph, cap in [(20, 3, 256), (15, 3, 256), (20, 3, 128), (30, 3, 192)]:
    f = jax.jit(functools.partial(run, it=it, ph=ph, cap=cap))
    t = measure(f, pj, qj, iters=3)
    got = float(jnp.mean(f(pj, qj)[:2]))
    print(f"it={it} ph={ph} cap={cap}: {t*1e3:7.1f} ms  mean_d2={got:.5f} (+{100*(got-opt)/opt:.1f}%)", flush=True)

# B=16 (config5 scale)
p16, q16 = pj[:16], qj[:16]
for it, ph, cap in [(20, 3, 256), (15, 3, 256)]:
    f = jax.jit(functools.partial(run, it=it, ph=ph, cap=cap))
    t = measure(f, p16, q16, iters=3)
    print(f"B16 it={it} ph={ph} cap={cap}: {t*1e3:7.1f} ms", flush=True)
