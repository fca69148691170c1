"""Round-3: resident ball-query support-chunk size sweep at headline shape."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import ballquery as bqk
from pytorch_points_tpu.kernels import fps as fpsk
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, P, NS = 32, 16384, 2048, 32
x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
cen = gather_points(x, fpsk.furthest_point_sample(x, P))

ref = None
for tm in (None,):
    f = jax.jit(lambda x, c, tm=tm: bqk.ball_query(x, c, 0.2, NS, tm=tm))
    idx, cnt = f(x, cen)
    if ref is None:
        ref = (idx, cnt)
    ok = bool(jnp.all(idx == ref[0])) and bool(jnp.all(cnt == ref[1]))
    t = measure(f, x, cen, iters=8) * 1e3
    print(f"tm={tm}: ball_query ms={t:.2f} match={ok}", flush=True)
