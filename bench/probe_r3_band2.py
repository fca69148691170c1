"""Round-3: band window sweep — band cost vs candidate-count increase at
tm=64 granularity (resident cost ~ 3.7 us per candidate pair-row)."""
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

for (tbq, stride) in ((256, 2), (128, 2), (256, 4), (128, 4), (64, 4)):
    f = jax.jit(lambda a, b, tbq=tbq, s=stride: nn_sorted.band_min(
        a, b, tb=512, tbq=tbq, stride=s))
    dub = f(pp, qp)
    t = measure(f, pp, qp, iters=8) * 1e3
    cand = nn_sorted._cand_mask(pp, qp, dub, 64, 512, 64)
    cnt = float(jnp.mean(jnp.sum(cand.reshape(B, -1), 1)))
    print(f"tbq={tbq:4d} s={stride}: band dir1 ms={t:.2f} "
          f"mean_cand={cnt:.0f}", flush=True)
