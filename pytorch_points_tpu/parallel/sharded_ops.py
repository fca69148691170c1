"""Point-sharded ("sequence parallel") distance ops.

For clouds too large for one device's pass — or to parallelize the O(N*M)
scan over chips — the support cloud is sharded over a mesh 'points' axis:
each device computes a running (min, argmin) against its local shard, and
the per-device minima are combined with one small all_gather (the argmin
is a streaming-combinable statistic, so this is exactly the ring-attention
decomposition with min instead of softmax; SURVEY.md §6)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pytorch_points_tpu.ops.chamfer import _nn_one_direction_xla


def _nn_direction_local(p_full, q_shard, axis: str):
    """Per-device: NN of every p point within the local q shard, then a
    global combine across the 'points' axis."""
    from pytorch_points_tpu.kernels import dispatch

    if dispatch.resolve("auto", "chamfer") == "pallas":
        from pytorch_points_tpu.kernels import distance_tiles

        d_loc, i_loc = distance_tiles.nn_one_direction(p_full, q_shard)
    else:
        d_loc, i_loc = _nn_one_direction_xla(p_full, q_shard)
    shard = q_shard.shape[1]
    i_loc = i_loc + jax.lax.axis_index(axis) * shard
    all_d = jax.lax.all_gather(d_loc, axis)  # [ndev, B, N]
    all_i = jax.lax.all_gather(i_loc, axis)
    best = jnp.argmin(all_d, axis=0)  # ties -> lowest device = lowest index
    dist = jnp.take_along_axis(all_d, best[None], axis=0)[0]
    idx = jnp.take_along_axis(all_i, best[None], axis=0)[0]
    return dist, idx


def nndistance_sharded(p, q, mesh, *, points_axis: str = "points"):
    """Bidirectional nndistance with q sharded over the points axis.

    Args:
      p: [B, N, 3] replicated across the points axis.
      q: [B, M, 3]; M must divide by the points-axis size.
      mesh: a Mesh containing ``points_axis``.

    Returns:
      (dist1 [B,N], idx1, dist2 [B,M], idx2) — dist2/idx2 sharded over M.
    """

    def impl(p_full, q_shard):
        d1, i1 = _nn_direction_local(p_full, q_shard, points_axis)
        # direction 2: each local q point scans the (replicated) p — no
        # communication at all.
        from pytorch_points_tpu.kernels import dispatch

        if dispatch.resolve("auto", "chamfer") == "pallas":
            from pytorch_points_tpu.kernels import distance_tiles

            d2, i2 = distance_tiles.nn_one_direction(q_shard, p_full)
        else:
            d2, i2 = _nn_one_direction_xla(q_shard, p_full)
        return d1, i1, d2, i2

    return jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), P(None, points_axis, None)),
        out_specs=(P(), P(), P(None, points_axis), P(None, points_axis)),
        check_vma=False,
    )(p, q)


def chamfer_sharded(p, q, mesh, *, points_axis: str = "points"):
    """Mean bidirectional chamfer with q sharded over the points axis."""
    d1, _, d2, _ = nndistance_sharded(p, q, mesh, points_axis=points_axis)
    return jnp.mean(jnp.mean(d1, -1) + jnp.mean(d2, -1))
