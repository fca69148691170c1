"""Isolate the bench-scale d1 mismatch: kernel output vs un-permute."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted, distance_tiles

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

dd1, di1, dd2, di2 = jax.jit(distance_tiles.nn_both_directions)(p, q)

# recompute pieces of nndistance_indexed stepwise
ps, perm_p = nn_sorted.sort_by_morton(p)
qs, perm_q = nn_sorted.sort_by_morton(q)
tn, tm, ft, tb = 512, 256, 64, 512
ps4 = jnp.concatenate([ps, perm_p[..., None].astype(jnp.float32)], -1)
qs4 = jnp.concatenate([qs, perm_q[..., None].astype(jnp.float32)], -1)

@jax.jit
def run():
    pp = nn_sorted._pad_points_poison(ps4, N)
    qp = nn_sorted._pad_points_poison_neg(qs4, N)
    d_ub1 = nn_sorted.band_min(pp, qp, tb=tb)
    cand1 = nn_sorted._cand_mask(pp, qp, d_ub1, ft, tn, tm)
    ni, nj = cand1.shape[1], cand1.shape[2]
    k_max = min(ni * nj, int(nn_sorted._BUDGET_FRAC * ni * nj) + ni)
    pairs, count = nn_sorted._compact_pairs(cand1, k_max)
    d1s, i1s = nn_sorted._run_resident(pairs, jnp.minimum(count, k_max),
                                       pp, qp, tn, tm, tie_orig=True)
    ovf = jnp.any(count > k_max)
    return d1s, i1s, ovf, count

d1s, i1s, ovf, count = run()
print("overflow:", bool(ovf), "max count:", int(jnp.max(count)))

# sorted-space compare: dense d1 gathered into sorted order
dd1_sorted = jnp.take_along_axis(dd1, perm_p, axis=1)
mm = np.asarray(d1s != dd1_sorted)
print("sorted-space d1 mismatches:", mm.sum(), "of", mm.size)
if mm.sum():
    bidx, ridx = np.nonzero(mm)
    for k in range(min(5, mm.sum())):
        b, r = bidx[k], ridx[k]
        print(f"  b={b} r={r} kernel={float(d1s[b,r]):.9g} dense={float(dd1_sorted[b,r]):.9g}")

# orig ids from kernel vs dense idx
di1_sorted = jnp.take_along_axis(di1, perm_p, axis=1)
im = np.asarray(i1s != di1_sorted)
print("sorted-space i1 mismatches:", im.sum())

# un-permute stage
d1u, i1u = jax.jit(nn_sorted._unpermute_rows, static_argnums=3)(perm_p, d1s, i1s, N)
um = np.asarray(d1u != dd1)
print("after unpermute d1 mismatches:", um.sum())
