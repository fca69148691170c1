"""Round-3: chunk-pruned resident ball query vs dense grid kernel at the
graded shapes, + sorted SA pipeline end-to-end."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import ballquery, bq_sorted, nn_sorted, fps as fpsk
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.ops.grouping import group_points, sample_and_group_sorted, sample_and_group
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)

for B in (16, 32):
    x = jnp.asarray(rng.uniform(-1, 1, (B, 16384, 3)), jnp.float32)
    xs, _ = nn_sorted.sort_by_morton(x)
    idx = fpsk.furthest_point_sample(xs, 2048)
    cen = gather_points(xs, idx)
    cs, _ = nn_sorted.sort_by_morton(cen)

    f_dense = jax.jit(lambda xs, cs: ballquery.ball_query(xs, cs, 0.2, 32))
    print(f"B={B} dense bq ms:", measure(f_dense, xs, cs) * 1e3, flush=True)
    for tp, tm in ((512, 128), (512, 96), (1024, 96), (256, 128)):
        f_s = jax.jit(lambda xs, cs, tp=tp, tm=tm: bq_sorted.ball_query_sorted(
            xs, cs, 0.2, 32, tp=tp, tm=tm))
        i1, c1 = f_s(xs, cs)
        i0, c0 = f_dense(xs, cs)
        eq = bool(jnp.all(i1 == i0) and jnp.all(c1 == c0))
        print(f"B={B} sorted bq tp={tp} tm={tm} ms:",
              measure(f_s, xs, cs) * 1e3, "equal:", eq, flush=True)
    # fused with coords
    f_sc = jax.jit(lambda xs, cs: bq_sorted.ball_query_sorted(
        xs, cs, 0.2, 32, tp=512, tm=128, with_coords=True))
    print(f"B={B} sorted bq+coords ms:", measure(f_sc, xs, cs) * 1e3, flush=True)

# config3-style end-to-end: FPS + bq + group
x16 = jnp.asarray(rng.uniform(-1, 1, (16, 16384, 3)), jnp.float32)
def cfg3_ref(x):
    idx = fpsk.furthest_point_sample(x, 2048)
    cen = gather_points(x, idx)
    nidx, _ = ballquery.ball_query(x, cen, 0.2, 32)
    return group_points(x, nidx)
def cfg3_sorted(x):
    _, nf, _, g, _ = sample_and_group_sorted(x, None, 2048, 32, 0.2)
    return g
print("config3 reference path ms:", measure(jax.jit(cfg3_ref), x16) * 1e3)
print("config3 sorted pipeline ms:", measure(jax.jit(cfg3_sorted), x16) * 1e3)
