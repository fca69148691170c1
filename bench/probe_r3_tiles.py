"""Round-3: resident-kernel tile-granularity sweep.

The candidate mask is OR-folded over a [ktn, ktm] kernel tile, so finer
tiles visit fewer spurious elements; the floor is the set of tile pairs
that contain at least one point's true NN.  Measures visit rate, floor,
and actual resident time per granularity.
"""
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
ps, permp = nn_sorted.sort_by_morton(p)
qs, permq = nn_sorted.sort_by_morton(q)
ps4 = jnp.concatenate([ps, permp[..., None].astype(jnp.float32)], -1)
qs4 = jnp.concatenate([qs, permq[..., None].astype(jnp.float32)], -1)
n_pad = _round_up(N, 512)
pp = _pad_points_poison(ps4, n_pad)
qp = _pad_points_poison_neg(qs4, n_pad)

dub1 = nn_sorted.band_min(pp, qp, tb=512, tbq=256, stride=2)

# true NN in sorted space (from the current default config)
c1_ref = nn_sorted._cand_mask(pp, qp, dub1, 64, 512, 256)
pr, ct = nn_sorted._compact_pairs(c1_ref, 1301)
d1s, i1s = nn_sorted._run_resident(pr, ct, pp, qp, 512, 256, tie_orig=False)
i1s = np.asarray(i1s[:, :N])  # sorted-space q index per sorted p point

for (tn, tm) in [(512, 256), (512, 128), (512, 64), (256, 256), (256, 128),
                 (1024, 128), (256, 64)]:
    ni, nj = n_pad // tn, n_pad // tm
    cand = nn_sorted._cand_mask(pp, qp, dub1, min(64, tm), tn, tm)
    frac = float(jnp.mean(jnp.sum(cand.reshape(B, -1), 1))) / (ni * nj)
    # floor: pairs containing >=1 true NN
    rows = np.arange(N) // tn
    cols = i1s // tm
    packed = rows[None, :] * nj + cols
    floor = np.mean([len(np.unique(packed[b])) for b in range(B)]) / (ni * nj)
    # visited elements relative to dense
    print(f"tn={tn:5d} tm={tm:4d}: visit={frac:.3f} floor={floor:.3f} "
          f"elems={frac * 100:.1f}% pairs/b={frac * ni * nj:.0f}", flush=True)
    k_max = min(ni * nj, int(frac * ni * nj * 1.35) + ni)
    pr2, ct2 = nn_sorted._compact_pairs(cand, k_max)
    res = jax.jit(lambda pr, ct, a, b, tn=tn, tm=tm: nn_sorted._run_resident(
        pr, ct, a, b, tn, tm, tie_orig=True))
    t = measure(res, pr2, jnp.minimum(ct2, k_max), pp, qp) * 1e3
    print(f"            resident dir1 ms: {t:.2f}", flush=True)
