"""Round-3 probe: nndistance_indexed (original-order, tie_orig kernel) at
bench scale vs the dense kernel and the loss-only sorted path."""
import numpy as np
import jax, jax.numpy as jnp
from pytorch_points_tpu.kernels import nn_sorted, distance_tiles
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N = 32, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

dense = jax.jit(distance_tiles.nn_both_directions)
idxp = jax.jit(nn_sorted.nndistance_indexed)
loss_path = jax.jit(nn_sorted.nndistance_sorted)

r_i = idxp(p, q)
r_d = dense(p, q)
for a, b, name in [(r_i[0], r_d[0], "d1"), (r_i[1], r_d[1], "i1"),
                   (r_i[2], r_d[2], "d2"), (r_i[3], r_d[3], "i2")]:
    eq = bool(jnp.all(a == b))
    print(f"{name} equal: {eq}")
    assert eq, name

print("dense  ms:", measure(dense, p, q))
print("indexed ms:", measure(idxp, p, q))
print("loss-sorted ms:", measure(loss_path, p, q))
