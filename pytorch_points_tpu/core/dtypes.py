"""Dtype policy.

Coordinates and distances are kept in float32: the fidelity bar is
"pairwise distances within 1e-5 and index-identical FPS selections"
(BASELINE.json:5), which bf16 coordinates cannot guarantee (argmin ties
would flip).  Network *features* may be bf16; the MXU contractions in the
layers use ``preferred_element_type=float32`` accumulation.
"""

import jax.numpy as jnp

# Dtype used for coordinates / pairwise distances.
compute_dtype = jnp.float32

# Dtype used for accumulation in matmuls and reductions.
accum_dtype = jnp.float32
