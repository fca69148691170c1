"""Per-phase-budget EMD + resident ball query, on TPU."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import auction, ballquery, fps as fpsk, nn_sorted
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.ops.grouping import group_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)

# --- EMD ---
from flax import nnx
from pytorch_points_tpu.models import PointCloudAutoencoder
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
x5 = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)
pred5 = jax.lax.stop_gradient(model(x5))
eps, iters, phases = 0.005, 15, 3
f = jax.jit(lambda p, q: auction.auction_assignment(p, q, eps, iters, phases=phases))
cnt = auction.auction_unassigned_count(pred5, x5, eps, iters, phases=phases)
print("correlated stragglers (early=60):", int(jnp.mean(cnt)), flush=True)
print("correlated B=16 ms:", measure(f, pred5, x5) * 1e3, flush=True)
p4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
q4 = jnp.asarray(rng.standard_normal((32, 2048, 3)), jnp.float32)
print("random B=32 ms:", measure(f, p4, q4) * 1e3, flush=True)
# quality spot check (correlated, 4 elems)
try:
    from scipy.optimize import linear_sum_assignment
    a = f(pred5[:4], x5[:4])
    qsel = jnp.take_along_axis(x5[:4], a[..., None], axis=1)
    got = np.asarray(jnp.sum((pred5[:4] - qsel) ** 2, -1).mean(1), np.float64)
    exc = []
    for bi in range(4):
        d2 = ((np.asarray(pred5[bi], np.float64)[:, None] - np.asarray(x5[bi], np.float64)[None]) ** 2).sum(-1)
        r, c = linear_sum_assignment(d2)
        exc.append(100 * (got[bi] - d2[r, c].mean()) / d2[r, c].mean())
    print("correlated excess%:", [round(e, 2) for e in exc], flush=True)
except ImportError:
    pass

# --- resident ball query ---
for B in (16, 32):
    x = jnp.asarray(rng.uniform(-1, 1, (B, 16384, 3)), jnp.float32)
    idx = fpsk.furthest_point_sample(x, 2048)
    cen = gather_points(x, idx)
    f_res = jax.jit(lambda x, c: ballquery.ball_query(x, c, 0.2, 32))       # resident now
    f_grid = jax.jit(lambda x, c: ballquery.ball_query(x, c, 0.2, 32, tp=2048))  # old grid
    ir, cr = f_res(x, cen); ig, cg = f_grid(x, cen)
    print(f"B={B} resident == grid:", bool(jnp.all(ir == ig) and jnp.all(cr == cg)), flush=True)
    print(f"B={B} grid bq ms:", measure(f_grid, x, cen) * 1e3, flush=True)
    print(f"B={B} resident bq ms:", measure(f_res, x, cen) * 1e3, flush=True)
    fc = jax.jit(lambda x, c: ballquery.ball_query_and_group_coords(x, c, 0.2, 32))
    print(f"B={B} resident bq+coords ms:", measure(fc, x, cen) * 1e3, flush=True)
