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


def nndistance_ring(p, q, mesh, *, points_axis: str = "points"):
    """Fully-sharded bidirectional nndistance via a ring pass (SURVEY.md §6).

    BOTH clouds are sharded over the points axis — neither is ever
    materialized on one device, so N is bounded by per-device HBM times
    the ring size.  Each step, every device matches its resident p shard
    against the visiting q shard and updates (a) its local dir-1 running
    argmin and (b) the dir-2 running argmin that TRAVELS with the q shard
    around the ring (ring attention's KV rotation with argmin as the
    combinable statistic; communication rides ICI via ppermute).

    Args:
      p: [B, N, 3], q: [B, M, 3]; N and M divisible by the axis size.

    Returns:
      (dist1 [B,N], idx1, dist2 [B,M], idx2), dist/idx sharded like their
      cloud.
    """

    def impl(p_shard, q_shard):
        from pytorch_points_tpu.kernels import dispatch

        if dispatch.resolve("auto", "chamfer") == "pallas":
            from pytorch_points_tpu.kernels import distance_tiles

            nn = distance_tiles.nn_both_directions
        else:
            def nn(a, b):
                da, ia = _nn_one_direction_xla(a, b)
                db, ib = _nn_one_direction_xla(b, a)
                return da, ia, db, ib

        ndev = jax.lax.axis_size(points_axis)
        me = jax.lax.axis_index(points_axis)
        b, n_loc, _ = p_shard.shape
        m_loc = q_shard.shape[1]
        inf = jnp.full((b, n_loc), jnp.inf, jnp.float32)

        def step(t, state):
            d1, i1, q_cur, d2_cur, i2_cur = state
            # owner of the visiting shard: it left device (me - t) % ndev
            owner = (me - t) % ndev
            ld1, li1, ld2, li2 = nn(p_shard, q_cur)
            li1 = li1 + owner * m_loc  # global q indices
            li2 = li2 + me * n_loc  # global p indices
            # shards visit out of index order -> ties need the index rule
            take1 = jnp.logical_or(
                ld1 < d1, jnp.logical_and(ld1 == d1, li1 < i1)
            )
            d1 = jnp.where(take1, ld1, d1)
            i1 = jnp.where(take1, li1, i1)
            take2 = jnp.logical_or(
                ld2 < d2_cur, jnp.logical_and(ld2 == d2_cur, li2 < i2_cur)
            )
            d2_cur = jnp.where(take2, ld2, d2_cur)
            i2_cur = jnp.where(take2, li2, i2_cur)
            # rotate the q shard and its traveling accumulators
            perm = [(s, (s + 1) % ndev) for s in range(ndev)]
            q_cur = jax.lax.ppermute(q_cur, points_axis, perm)
            d2_cur = jax.lax.ppermute(d2_cur, points_axis, perm)
            i2_cur = jax.lax.ppermute(i2_cur, points_axis, perm)
            return d1, i1, q_cur, d2_cur, i2_cur

        init = (
            inf,
            jnp.zeros((b, n_loc), jnp.int32),
            q_shard,
            jnp.full((b, m_loc), jnp.inf, jnp.float32),
            jnp.zeros((b, m_loc), jnp.int32),
        )
        d1, i1, _, d2, i2 = jax.lax.fori_loop(0, ndev, step, init)
        # after ndev steps (incl. ndev rotations) the accumulators are home
        return d1, i1, d2, i2

    return jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(None, points_axis, None), P(None, points_axis, None)),
        out_specs=(
            P(None, points_axis),
            P(None, points_axis),
            P(None, points_axis),
            P(None, points_axis),
        ),
        check_vma=False,
    )(p, q)
