"""Round-3: cand_mask layout — trailing [..., 3] channel axis (3/128 lanes
used) vs channel-split with the q-subtile axis trailing (lane-aligned)."""
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
n_pad = _round_up(N, 512)
pp = _pad_points_poison(ps, n_pad)
qp = _pad_points_poison_neg(qs, n_pad)
dub1 = nn_sorted.band_min(pp, qp, tb=512, tbq=256, stride=2)
dub2 = nn_sorted.band_min(qp, pp, tb=512, tbq=256, stride=2)


def cand_mask_split(ps, qs, d_ub, ft, ktn, ktm):
    ps = ps[..., :3]
    qs = qs[..., :3]
    b, n, _ = ps.shape
    m = qs.shape[1]
    ni, nj, fpk = n // ktn, m // ktm, ktm // ft
    njf = nj * fpk
    qt = qs.reshape(b, njf, ft, 3)
    qlo = jnp.min(qt, axis=2)  # [b, njf, 3]
    qhi = jnp.max(qt, axis=2)
    pr = ps.reshape(b, ni, ktn, 3)
    lb = jnp.zeros((b, ni, ktn, njf), jnp.float32)
    for c in range(3):
        lo = qlo[..., c][:, None, None, :]
        hi = qhi[..., c][:, None, None, :]
        pc = pr[..., c][..., None]
        gap = jnp.maximum(jnp.maximum(lo - pc, pc - hi), 0.0)
        lb = lb + gap * gap
    ok = lb * (1.0 - 1e-5) <= d_ub.reshape(b, ni, ktn, 1)
    okf = jnp.any(ok, axis=2).reshape(b, ni, nj, fpk)
    return jnp.any(okf, axis=3)


for (ktm, ft) in ((64, 64), (256, 64)):
    f_old = jax.jit(lambda a, b, d, ktm=ktm, ft=ft:
                    (nn_sorted._cand_mask(a, b, d, ft, 512, ktm),))
    f_new = jax.jit(lambda a, b, d, ktm=ktm, ft=ft:
                    (cand_mask_split(a, b, d, ft, 512, ktm),))
    c_old = f_old(pp, qp, dub1)[0]
    c_new = f_new(pp, qp, dub1)[0]
    same = bool(jnp.all(c_old == c_new))
    t_old = measure(f_old, pp, qp, dub1, iters=8) * 1e3
    t_new = measure(f_new, pp, qp, dub1, iters=8) * 1e3
    print(f"ktm={ktm} ft={ft}: old={t_old:.2f} ms split={t_new:.2f} ms "
          f"equal={same}", flush=True)
