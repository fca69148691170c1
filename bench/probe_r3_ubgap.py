"""Round-3: how much of the candidate-mask slack is loose d_ub vs
inherent AABB lower-bound looseness?  Compare visit rates with the band
d_ub vs a PERFECT d_ub (true NN distances)."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted
from pytorch_points_tpu.utils.benchmark import measure
from pytorch_points_tpu.kernels.distance_tiles import (
    _pad_points_poison, _pad_points_poison_neg, _round_up)

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
ps, _ = nn_sorted.sort_by_morton(p)
qs, _ = nn_sorted.sort_by_morton(q)
n_pad = _round_up(N, 512)
pp = _pad_points_poison(ps, n_pad)
qp = _pad_points_poison_neg(qs, n_pad)

dub_band = nn_sorted.band_min(pp, qp, tb=512, tbq=128, stride=4)

# perfect d_ub: true NN distances of the sorted p cloud vs sorted q cloud
c0 = nn_sorted._cand_mask(pp, qp, dub_band, 64, 512, 64)
ni, nj = c0.shape[1], c0.shape[2]
k_max = min(ni * nj, int(nn_sorted._BUDGET_FRAC * ni * nj) + ni)
pr, ct = nn_sorted._compact_pairs(c0, k_max)
d_true, _ = nn_sorted._run_resident(pr, jnp.minimum(ct, k_max), pp, qp,
                                    512, 64)

for name, dub in (("band(128,s4)", dub_band), ("exact", d_true)):
    cand = nn_sorted._cand_mask(pp, qp, dub, 64, 512, 64)
    cnt = float(jnp.mean(jnp.sum(cand.reshape(B, -1), 1)))
    print(f"{name:14s}: visit={cnt / (ni * nj):.3f} mean_cand={cnt:.0f}",
          flush=True)

# how loose is the band bound per point?
slack = np.asarray(dub_band[:, :N] / np.maximum(np.asarray(d_true[:, :N]), 1e-12))
print("d_ub/d_true percentiles:",
      {p_: round(float(np.percentile(slack, p_)), 2)
       for p_ in (50, 90, 99, 99.9, 100)}, flush=True)
