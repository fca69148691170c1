"""Round-3: segmented-worklist resident kernel sweep over q-tile size."""
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

# reference: current flat-worklist kernel at 512x256
c1, s1 = nn_sorted._cand_mask_fine(pp, qp, dub1, 64, 512, 256)
prf, ctf = nn_sorted._compact_pairs_sub(c1, s1, 1301)
ref_d, ref_i = nn_sorted._run_resident(prf, ctf, pp, qp, 512, 256, 64,
                                       tie_orig=True)

for tq in (256, 128, 64, 32):
    cand = nn_sorted._cand_mask(pp, qp, dub1, min(64, tq), 512, tq)
    ni, nj = cand.shape[1], cand.shape[2]
    frac = float(jnp.mean(jnp.sum(cand.reshape(B, -1), 1))) / (ni * nj)
    k_max = int(frac * ni * nj * 1.35) + ni
    cols, offs, cnt = nn_sorted._compact_segments(cand, k_max)
    f = jax.jit(lambda cols, offs, a, b, tq=tq: nn_sorted._run_resident_seg(
        cols, offs, a, b, 512, tq, tie_orig=True))
    d, i = f(cols, offs, pp, qp)
    ok = bool(jnp.all(d[:, :N] == ref_d[:, :N])) and bool(
        jnp.all(i[:, :N] == ref_i[:, :N]))
    t = measure(f, cols, offs, pp, qp, iters=8) * 1e3
    print(f"tq={tq:4d}: visit={frac:.3f} k_max={k_max} smem_kb="
          f"{k_max * B * 4 // 1024} dir1 ms={t:.2f} bitwise={ok}", flush=True)
