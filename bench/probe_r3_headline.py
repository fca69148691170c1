"""Round-3: headline component breakdown at B=32 N=16k P=2048."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.kernels import fps as fpsk
from pytorch_points_tpu.ops.grouping import group_points
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, P, NS = 32, 16384, 2048, 32
x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

f_fps = jax.jit(lambda x: fpsk.furthest_point_sample(x, P))
idx = f_fps(x)
print("fps ms:", measure(f_fps, x) * 1e3, flush=True)

f_gat = jax.jit(lambda x, i: gather_points(x, i))
cen = f_gat(x, idx)
print("gather_points(P) ms:", measure(f_gat, x, idx) * 1e3, flush=True)

f_bq = jax.jit(lambda x, c: bqk.ball_query(x, c, 0.2, NS))
nidx, cnt = f_bq(x, cen)
print("ball_query ms:", measure(f_bq, x, cen) * 1e3, flush=True)

f_bqc = jax.jit(lambda x, c: bqk.ball_query_and_group_coords(x, c, 0.2, NS))
outc = f_bqc(x, cen)
print("bq+coords ms:", measure(f_bqc, x, cen) * 1e3, flush=True)

f_grp = jax.jit(lambda x, i: group_points(x, i))
g = f_grp(x, nidx)
print("group_points fwd ms:", measure(f_grp, x, nidx) * 1e3, flush=True)

f_grpb = jax.jit(jax.grad(lambda x, i: jnp.mean((group_points(x, i)
                                                 - cen[:, :, None, :]) ** 2)))
_ = f_grpb(x, nidx)
print("group+center fwd+bwd ms:", measure(f_grpb, x, nidx) * 1e3, flush=True)

# coords match: fused centered coords == group - cen where slots filled
gc = outc[2]
ref = g - cen[:, :, None, :]
filled = jnp.arange(NS)[None, None, :] < cnt[..., None]
print("fused coords match:", bool(jnp.all(jnp.where(filled[..., None], gc - ref, 0.0) == 0.0)))
