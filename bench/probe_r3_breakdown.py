"""Round-3: chamfer stage-by-stage breakdown at bench scale + loss-path vs
indexed-path fwd+bwd comparison (which should serve chamfer_distance?)."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted, distance_tiles
from pytorch_points_tpu.ops import chamfer as chamfer_mod
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

# stage timings (each jitted separately; sums roughly to the fused time)
sort2 = jax.jit(lambda p, q: (nn_sorted.sort_by_morton(p)[0],
                              nn_sorted.sort_by_morton(q)[0]))
print("2x morton sort ms:", measure(sort2, p, q) * 1e3)

ps, _ = nn_sorted.sort_by_morton(p)
qs, _ = nn_sorted.sort_by_morton(q)

band2 = jax.jit(lambda a, b: (nn_sorted.band_min(a, b),
                              nn_sorted.band_min(b, a)))
print("2x band_min ms:", measure(band2, ps, qs) * 1e3)

dub1 = nn_sorted.band_min(ps, qs)
dub2 = nn_sorted.band_min(qs, ps)
cand2 = jax.jit(lambda ps, qs, d1, d2: (
    nn_sorted._cand_mask(ps, qs, d1, 64, 512, 256),
    nn_sorted._cand_mask(qs, ps, d2, 64, 512, 256)))
print("2x cand_mask ms:", measure(cand2, ps, qs, dub1, dub2) * 1e3)

c1, c2 = cand2(ps, qs, dub1, dub2)
comp2 = jax.jit(lambda c1, c2: (nn_sorted._compact_pairs(c1, 1301),
                                nn_sorted._compact_pairs(c2, 1301)))
print("2x compact ms:", measure(comp2, c1, c2) * 1e3)

(pr1, ct1), (pr2, ct2) = comp2(c1, c2)
res1 = jax.jit(lambda pr, ct, a, b: nn_sorted._run_resident(
    pr, ct, a, b, 512, 256, tie_orig=True))
print("resident dir1 ms:", measure(res1, pr1, ct1, ps, qs) * 1e3)
print("resident dir2 ms:", measure(res1, pr2, ct2, qs, ps) * 1e3)
print("mean count1:", float(jnp.mean(ct1)), "count2:", float(jnp.mean(ct2)),
      "of k_max 1301, frac of 2048:",
      float(jnp.mean(ct1)) / 2048, float(jnp.mean(ct2)) / 2048)

# fwd+bwd: loss path (sorted_d) vs indexed path
def loss_sorted(p, q):
    d1, d2 = chamfer_mod._nndistance_sorted_d(p, q)
    return jnp.mean(d1) + jnp.mean(d2)

def loss_indexed(p, q):
    d1, _, d2, _ = chamfer_mod._nndistance(p, q, "sorted")
    return jnp.mean(d1) + jnp.mean(d2)

g_s = jax.jit(jax.value_and_grad(loss_sorted))
g_i = jax.jit(jax.value_and_grad(loss_indexed))
v1, gg1 = g_s(p, q); v2, gg2 = g_i(p, q)
print("loss values equal:", bool(jnp.isclose(v1, v2, rtol=1e-7)))
print("fwd+bwd loss-path ms:", measure(g_s, p, q) * 1e3)
print("fwd+bwd indexed   ms:", measure(g_i, p, q) * 1e3)
print("fwd-only indexed  ms:", measure(jax.jit(lambda p, q: chamfer_mod._nndistance(p, q, "sorted")[0]), p, q) * 1e3)
