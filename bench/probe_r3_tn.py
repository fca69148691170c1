"""Round-3: post-unroll tn sweep for nndistance_indexed (tn was tuned to
512 BEFORE the 4x unroll flipped the fine-tile economics; finer p-tiles
tighten the OR-fold over p rows in the candidate mask at the cost of 2x/4x
worklist entries), plus the packed-key compaction and emitted-coords FPS
deltas."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted, distance_tiles
from pytorch_points_tpu.kernels import fps as fpsk
from pytorch_points_tpu.ops.sampling import gather_points
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

ref = jax.jit(distance_tiles.nn_both_directions)(p, q)

for tn in (512, 256, 128):
    f = jax.jit(lambda p, q, tn=tn: nn_sorted.nndistance_indexed(p, q, tn=tn))
    out = f(p, q)
    ok = all(bool(jnp.all(a == b)) for a, b in zip(out, ref))
    t = measure(f, p, q, iters=8) * 1e3
    print(f"tn={tn:4d}: nndistance_indexed ms={t:.2f} bitwise={ok}",
          flush=True)

# Emitted-coords FPS vs FPS + gather at the headline sample shape.
f_plain = jax.jit(lambda x: gather_points(
    x, fpsk.furthest_point_sample(x, 2048)))
f_emit = jax.jit(lambda x: fpsk.furthest_point_sample(
    x, 2048, emit_coords=True)[1])
a, b = f_plain(p), f_emit(p)
print("fps+gather ms:", measure(f_plain, p, iters=8) * 1e3,
      "emit ms:", measure(f_emit, p, iters=8) * 1e3,
      "bitwise:", bool(jnp.all(a == b)), flush=True)
