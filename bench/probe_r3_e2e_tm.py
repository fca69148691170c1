"""Round-3: end-to-end tm sweep for nndistance_indexed with the unrolled
resident kernel (includes sort + band + cand mask + compaction costs)."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted, distance_tiles
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

ref = jax.jit(distance_tiles.nn_both_directions)(p, q)

for tm in (256, 128, 64):
    f = jax.jit(lambda p, q, tm=tm: nn_sorted.nndistance_indexed(p, q, tm=tm))
    out = f(p, q)
    ok = all(bool(jnp.all(a == b)) for a, b in zip(out, ref))
    t = measure(f, p, q, iters=8) * 1e3
    print(f"tm={tm:4d}: nndistance_indexed ms={t:.2f} bitwise_vs_dense={ok}",
          flush=True)
