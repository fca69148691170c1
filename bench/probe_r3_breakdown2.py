"""Round-3b: chamfer stage breakdown at bench scale (post-indexed-path).

All outputs consumed (sum-reduced) so XLA cannot DCE a stage.
"""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted
from pytorch_points_tpu.ops import chamfer as chamfer_mod
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

sort2 = jax.jit(lambda p, q: (nn_sorted.sort_by_morton(p),
                              nn_sorted.sort_by_morton(q)))
(ps, permp), (qs, permq) = sort2(p, q)
print("2x morton sort ms:", measure(sort2, p, q) * 1e3)

# indexed path uses 4-channel clouds (orig ids in ch 3)
from pytorch_points_tpu.kernels.distance_tiles import (
    _pad_points_poison, _pad_points_poison_neg, _round_up)
ps4 = jnp.concatenate([ps, permp[..., None].astype(jnp.float32)], -1)
qs4 = jnp.concatenate([qs, permq[..., None].astype(jnp.float32)], -1)
n_pad = _round_up(N, 512)
pp = _pad_points_poison(ps4, n_pad)
qp = _pad_points_poison_neg(qs4, n_pad)

band2 = jax.jit(lambda a, b: (nn_sorted.band_min(a, b, tb=512, tbq=256, stride=2),
                              nn_sorted.band_min(b, a, tb=512, tbq=256, stride=2)))
dub1, dub2 = band2(pp, qp)
print("2x band_min(256,s2) ms:", measure(band2, pp, qp) * 1e3)

cand2 = jax.jit(lambda ps, qs, d1, d2: (
    nn_sorted._cand_mask(ps, qs, d1, 64, 512, 64),
    nn_sorted._cand_mask(qs, ps, d2, 64, 512, 64)))
c1, c2 = cand2(pp, qp, dub1, dub2)
print("2x cand_mask ms:", measure(cand2, pp, qp, dub1, dub2) * 1e3)

ni, nj = c1.shape[1], c1.shape[2]
k_max = min(ni * nj, int(nn_sorted._BUDGET_FRAC * ni * nj) + ni)
comp2 = jax.jit(lambda c1, c2: (nn_sorted._compact_pairs(c1, k_max),
                                nn_sorted._compact_pairs(c2, k_max)))
(pr1, ct1), (pr2, ct2) = comp2(c1, c2)
print("2x compact ms:", measure(comp2, c1, c2) * 1e3)

res = jax.jit(lambda pr, ct, a, b: nn_sorted._run_resident(
    pr, ct, a, b, 512, 64, tie_orig=True))
print("resident dir1 ms:", measure(res, pr1, ct1, pp, qp) * 1e3)
print("resident dir2 ms:", measure(res, pr2, ct2, qp, pp) * 1e3)
d1s, i1s = res(pr1, ct1, pp, qp)
print("mean count:", float(jnp.mean(ct1)), float(jnp.mean(ct2)),
      "k_max", k_max, "frac of", ni * nj, ":",
      float(jnp.mean(ct1)) / (ni * nj), float(jnp.mean(ct2)) / (ni * nj))

unp = jax.jit(lambda perm, d, i: nn_sorted._unpermute_rows(perm, d, i, N))
print("unpermute 1dir ms:",
      measure(unp, permp, d1s[:, :N], i1s[:, :N]) * 1e3)

# full fwd (all four outputs consumed)
fwd = jax.jit(lambda p, q: jax.tree.map(
    lambda a: jnp.sum(a.astype(jnp.float32)),
    nn_sorted.nndistance_indexed(p, q)))
_ = fwd(p, q)
print("full indexed fwd ms:", measure(fwd, p, q) * 1e3)

# fwd+bwd through the public loss
g_i = jax.jit(jax.value_and_grad(lambda p: chamfer_mod.chamfer_distance(p, q)))
_ = g_i(p)
print("chamfer fwd+bwd ms:", measure(g_i, p) * 1e3)

# bwd-only estimate: fwd+bwd minus fwd
