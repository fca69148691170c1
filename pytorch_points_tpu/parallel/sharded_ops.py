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
from pytorch_points_tpu.ops.pairwise import pairwise_sqdist


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


def furthest_point_sample_sharded(xyz, k: int, mesh, mask=None, *,
                                  points_axis: str = "points"):
    """FPS with the CLOUD sharded over the points axis (SURVEY.md §6
    "beyond-HBM N" analog for the sampling family).

    Each device keeps its shard's running min-distance plane resident; a
    step exchanges only the per-device argmax candidates ([ndev, B]
    all_gather) and the winner's coordinates (one psum) over ICI —
    O(k * ndev * B) bytes of communication total, independent of N.
    Index-identical to the single-device kernel: the shard order follows
    the global index order, so the lowest-index tie rule survives the
    two-level (local, then cross-device) argmax combine.

    Args:
      xyz: [B, N, 3] sharded (or shardable) over N; N divisible by the
        axis size.
      mask: optional [B, N] validity mask, sharded like xyz.

    Returns:
      [B, k] int32 global indices, replicated.
    """

    def impl_body(x_shard, m_shard):
        ndev = jax.lax.axis_size(points_axis)
        me = jax.lax.axis_index(points_axis)
        b, n_loc, _ = x_shard.shape
        iota_loc = jnp.arange(n_loc, dtype=jnp.int32)[None, :]
        if m_shard is None:
            mind0 = jnp.full((b, n_loc), 1e10, jnp.float32)
        else:
            mind0 = jnp.where(m_shard, jnp.float32(1e10), -jnp.inf)
        big = jnp.int32(2**30)

        def body(j, carry):
            mind, sel_c, out = carry
            d = jnp.sum((x_shard - sel_c[:, None, :]) ** 2, axis=-1)
            mind = jnp.where(j > 0, jnp.minimum(mind, d), mind)
            # local argmax, lowest local index on ties
            mloc = jnp.max(mind, axis=1)  # [B]
            aloc = jnp.min(
                jnp.where(mind == mloc[:, None], iota_loc, big), axis=1
            )
            gloc = aloc + me * n_loc
            allm = jax.lax.all_gather(mloc, points_axis)  # [ndev, B]
            allg = jax.lax.all_gather(gloc, points_axis)
            gm = jnp.max(allm, axis=0)  # [B]
            # device order == global index order -> min global index
            gidx = jnp.min(
                jnp.where(allm == gm[None], allg, big), axis=0
            ).astype(jnp.int32)
            # winner's coordinates: one-hot local extract + psum
            loc = gidx - me * n_loc
            onehot = jnp.logical_and(
                iota_loc == loc[:, None],
                jnp.logical_and(loc >= 0, loc < n_loc)[:, None],
            )
            c = jnp.sum(jnp.where(onehot[..., None], x_shard, 0.0), axis=1)
            c = jax.lax.psum(c, points_axis)  # [B, 3]
            out = out.at[:, j].set(gidx)
            return mind, c, out

        init = (
            mind0,
            jnp.zeros((b, 3), jnp.float32),
            jnp.zeros((b, k), jnp.int32),
        )
        _, _, out = jax.lax.fori_loop(0, k, body, init)
        return out

    if mask is None:
        return jax.shard_map(
            lambda x: impl_body(x, None),
            mesh=mesh,
            in_specs=(P(None, points_axis, None),),
            out_specs=P(),
            check_vma=False,
        )(xyz)
    return jax.shard_map(
        impl_body,
        mesh=mesh,
        in_specs=(P(None, points_axis, None), P(None, points_axis)),
        out_specs=P(),
        check_vma=False,
    )(xyz, mask)


def ball_query_sharded(xyz, centroids, radius: float, nsample: int, mesh,
                       mask=None, *, points_axis: str = "points"):
    """Ball query with the QUERY set sharded over the points axis
    (embarrassingly parallel: support replicated, zero communication).

    Returns (idx [B, P, nsample], cnt [B, P]) sharded over P."""
    from pytorch_points_tpu.ops.grouping import ball_query

    if mask is None:
        def impl0(x_full, cen_shard):
            return ball_query(x_full, cen_shard, radius, nsample)

        return jax.shard_map(
            impl0,
            mesh=mesh,
            in_specs=(P(), P(None, points_axis, None)),
            out_specs=(P(None, points_axis, None), P(None, points_axis)),
            check_vma=False,
        )(xyz, centroids)

    def impl1(x_full, cen_shard, m_full):
        return ball_query(x_full, cen_shard, radius, nsample, mask=m_full)

    return jax.shard_map(
        impl1,
        mesh=mesh,
        in_specs=(P(), P(None, points_axis, None), P()),
        out_specs=(P(None, points_axis, None), P(None, points_axis)),
        check_vma=False,
    )(xyz, centroids, mask)


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


def group_points_sharded(features, idx, mesh, *,
                         points_axis: str = "points"):
    """Neighborhood gather with the QUERY set sharded over the points
    axis: features replicated, idx [B, P, S] sharded over P, output
    [B, P, S, C] sharded over P.  The forward needs zero communication;
    under differentiation each device scatter-adds into a full-size
    features cotangent and shard_map inserts the psum that merges the
    partials (the reference's multi-GPU story left grouping on one
    device; SURVEY.md §3.3)."""
    from pytorch_points_tpu.ops.grouping import group_points

    def impl(f_full, idx_shard):
        return group_points(f_full, idx_shard)

    return jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), P(None, points_axis, None)),
        out_specs=P(None, points_axis, None, None),
        check_vma=False,
    )(features, idx)


def three_nn_sharded(unknown, known, mesh, *, points_axis: str = "points"):
    """FP-layer three_nn with the UNKNOWN (dense) cloud sharded over the
    points axis and the known cloud replicated — embarrassingly parallel,
    zero communication.  Returns (dist [B, N, 3], idx [B, N, 3]) sharded
    over N."""
    from pytorch_points_tpu.ops.interpolate import three_nn

    def impl(u_shard, k_full):
        return three_nn(u_shard, k_full)

    return jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(None, points_axis, None), P()),
        out_specs=(P(None, points_axis, None), P(None, points_axis, None)),
        check_vma=False,
    )(unknown, known)


def _auction_sharded_body(p_full, q_shard, eps, max_iters, axis: str):
    """One device's view of a Jacobi auction with OBJECTS (q) sharded.

    Person state (assign) is replicated and advanced identically on every
    device; object state (price, owner) lives with the object shard.  Per
    iteration the only communication is an all_gather of each shard's
    top-2 candidate values/indices/price ([ndev, B, N]-sized planes) plus
    two psum-OR folds of the per-person win/evict masks — O(ndev*B*N)
    bytes, independent of the O(B*N*M) scan work, which each device does
    only against its own object shard.

    Assignment-identical to ops.emd._auction_xla (the replicated
    correctness path): the cross-shard top-2 merge reproduces top_k's
    value-then-lowest-index ordering exactly (a value tie's lowest global
    index always appears in some shard's slot 0, because within a shard
    top_k already orders tied indices ascending), and the greedy
    completion picks the same (max benefit, min index) free object.
    Pinned by tests/test_parallel.py::test_emd_sharded_matches_replicated.
    """
    ndev = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, n, _ = p_full.shape
    m_loc = q_shard.shape[1]
    neg = jnp.float32(-1e30)
    person_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    barange = jnp.arange(b)[:, None]
    big = jnp.int32(2**30)

    def cond(state):
        it, assign, _, _ = state
        return jnp.logical_and(it < max_iters, jnp.any(assign < 0))

    def body(state):
        it, assign, owner_loc, price_loc = state
        # Local top-2 over this device's object shard (same elementwise
        # arithmetic as the replicated scan restricted to the shard).
        net = -pairwise_sqdist(p_full, q_shard) - price_loc[:, None, :]
        t2v, t2i = jax.lax.top_k(net, 2)  # [B, N, 2]
        g2 = t2i.astype(jnp.int32) + me * m_loc  # global object ids
        p_best = jnp.take_along_axis(
            price_loc, t2i[..., 0].astype(jnp.int32), axis=1
        )  # price of the local best object, [B, N]
        av = jax.lax.all_gather(t2v, axis)  # [ndev, B, N, 2]
        ag = jax.lax.all_gather(g2, axis)
        ap = jax.lax.all_gather(p_best, axis)  # [ndev, B, N]
        cv = jnp.moveaxis(av, 0, 2).reshape(b, n, 2 * ndev)
        cg = jnp.moveaxis(ag, 0, 2).reshape(b, n, 2 * ndev)
        # Global best: max value, ties -> lowest global object index.
        v1 = jnp.max(cv, axis=-1)
        g1 = jnp.min(
            jnp.where(cv == v1[..., None], cg, big), axis=-1
        ).astype(jnp.int32)
        # Second best excludes exactly the winner entry (object ids are
        # unique across shards).
        v2 = jnp.max(jnp.where(cg == g1[..., None], neg, cv), axis=-1)
        # Winner's pre-update price: it is some shard's slot-0 candidate.
        win0 = jnp.logical_and(av[..., 0] == v1[None], ag[..., 0] == g1[None])
        price1 = jnp.sum(jnp.where(win0, ap, 0.0), axis=0)
        bid = price1 + (v1 - v2) + eps
        bidding = assign < 0
        bid = jnp.where(bidding, bid, neg)
        # Per-object phase on the local shard only.
        tloc = g1 - me * m_loc
        in_shard = jnp.logical_and(tloc >= 0, tloc < m_loc)
        slot = jnp.where(jnp.logical_and(in_shard, bidding), tloc, m_loc)
        best_loc = jnp.full((b, m_loc), neg).at[barange, slot].max(
            bid, mode="drop"
        )
        my_best = jnp.take_along_axis(
            best_loc, jnp.clip(tloc, 0, m_loc - 1), axis=1
        )
        is_win = bidding & in_shard & (bid >= my_best)
        wslot = jnp.where(is_win, tloc, m_loc)
        winner_loc = (
            jnp.full((b, m_loc), n, dtype=jnp.int32)
            .at[barange, wslot]
            .min(person_ids, mode="drop")
        )
        has_bid = winner_loc < n
        winner_c = jnp.minimum(winner_loc, n - 1)
        price_loc = jnp.where(has_bid, best_loc, price_loc)
        prev_owner = jnp.where(has_bid, owner_loc, -1)
        # Per-person masks (local partials -> psum-OR across shards).
        evict_slot = jnp.where(prev_owner >= 0, prev_owner, n)
        evict = (
            jnp.zeros((b, n), jnp.int32)
            .at[barange, evict_slot]
            .max(1, mode="drop")
        )
        won_here = is_win & (
            jnp.take_along_axis(winner_loc, jnp.clip(tloc, 0, m_loc - 1),
                                axis=1)
            == person_ids
        )
        evict = jax.lax.psum(evict, axis) > 0
        won = jax.lax.psum(won_here.astype(jnp.int32), axis) > 0
        assign = jnp.where(evict, -1, assign)
        assign = jnp.where(won, g1, assign)
        owner_loc = jnp.where(has_bid, winner_c, owner_loc)
        return it + 1, assign, owner_loc, price_loc

    init = (
        jnp.int32(0),
        jnp.full((b, n), -1, jnp.int32),
        jnp.full((b, m_loc), -1, jnp.int32),
        jnp.zeros((b, m_loc), jnp.float32),
    )
    _, assign, owner_loc, _ = jax.lax.while_loop(cond, body, init)

    # Greedy completion, one assignment per step (matches _auction_xla).
    iota_loc = jnp.arange(m_loc, dtype=jnp.int32)[None, :]

    def c_cond(state):
        _, assign, _ = state
        return jnp.any(assign < 0)

    def c_body(state):
        it, assign, owner_loc = state
        unassigned = assign < 0
        pi = jnp.argmax(unassigned, axis=1).astype(jnp.int32)
        psel = jnp.take_along_axis(p_full, pi[:, None, None], axis=1)
        row = -jnp.sum((psel - q_shard) ** 2, axis=-1)  # [B, m_loc]
        masked = jnp.where(owner_loc < 0, row, neg)
        mloc = jnp.max(masked, axis=1)
        aloc = jnp.min(
            jnp.where(masked == mloc[:, None], iota_loc + me * m_loc, big),
            axis=1,
        )
        allm = jax.lax.all_gather(mloc, axis)  # [ndev, B]
        allg = jax.lax.all_gather(aloc, axis)
        gm = jnp.max(allm, axis=0)
        oj = jnp.min(jnp.where(allm == gm[None], allg, big), axis=0).astype(
            jnp.int32
        )
        do = jnp.any(unassigned, axis=1)
        p_slot = jnp.where(do, pi, n)
        assign = assign.at[barange[:, 0], p_slot].set(oj, mode="drop")
        ojl = oj - me * m_loc
        o_slot = jnp.where(
            do & (ojl >= 0) & (ojl < m_loc), ojl, m_loc
        )
        owner_loc = owner_loc.at[barange[:, 0], o_slot].set(pi, mode="drop")
        return it + 1, assign, owner_loc

    _, assign, _ = jax.lax.while_loop(
        c_cond, c_body, (jnp.int32(0), assign, owner_loc)
    )
    return assign


def _run_sharded_auction(p, q, eps, max_iters, mesh, points_axis):
    return jax.shard_map(
        lambda pf, qs: _auction_sharded_body(
            pf, qs, jnp.float32(eps), jnp.int32(max_iters), points_axis
        ),
        mesh=mesh,
        in_specs=(P(), P(None, points_axis, None)),
        out_specs=P(),
        check_vma=False,
    )(jax.lax.stop_gradient(p), jax.lax.stop_gradient(q))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _emd_sharded(p, q, eps, max_iters, mesh, points_axis):
    assign = _run_sharded_auction(p, q, eps, max_iters, mesh, points_axis)
    qsel = jnp.take_along_axis(q, assign[..., None], axis=1)
    return jnp.sum((p - qsel) ** 2, axis=-1), assign


def _emd_sharded_fwd(p, q, eps, max_iters, mesh, points_axis):
    assign = _run_sharded_auction(p, q, eps, max_iters, mesh, points_axis)
    qsel = jnp.take_along_axis(q, assign[..., None], axis=1)
    dist = jnp.sum((p - qsel) ** 2, axis=-1)
    return (dist, assign), (p, qsel, assign, q.shape[-2])


def _emd_sharded_bwd(eps, max_iters, mesh, points_axis, res, g):
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    p, qsel, assign, m = res
    g_dist, _ = g
    gp = 2.0 * g_dist[..., None] * (p - qsel)
    gq = scatter_add_auto(assign, -gp, m)
    return gp, gq


_emd_sharded.defvjp(_emd_sharded_fwd, _emd_sharded_bwd)


def earth_mover_distance_sharded(p, q, mesh, eps: float = 0.005,
                                 max_iters: int = 45, p_mask=None,
                                 q_mask=None, *,
                                 points_axis: str = "points"):
    """Auction EMD with the TARGET cloud's objects sharded over the
    points axis (SURVEY.md §3.3/§6 — the last graded op family to get a
    multi-device decomposition).

    Each device owns a q shard (its prices and ownership state) and scans
    persons only against that shard; the per-iteration cross-device
    traffic is a handful of [B, N] planes (candidate merge + win/evict
    masks), never the O(N*M) distance work.  The resulting assignment is
    exactly the replicated flat-eps Jacobi auction's
    (ops/emd.py _auction_xla with max_iters*phases = ``max_iters``), so
    quality follows the same eps contract.

    Masked/bucketed clouds follow the :func:`ops.emd.earth_mover_distance`
    contract: equal valid counts per batch element, rank-matched poison
    pads that match each other at distance 0.

    Args:
      p: [B, N, 3] replicated.
      q: [B, N, 3]; N divisible by the points-axis size.
      eps: flat bid increment (no eps-scaling phases on this path).
      max_iters: auction iteration budget before greedy completion.

    Returns:
      (dist [B, N], assign [B, N]) replicated; gradients flow along the
      matched pairs only (assignment locally constant), like the
      single-device op.
    """
    from pytorch_points_tpu.ops.emd import _poison_rank_matched

    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    if p.shape != q.shape or p.ndim != 3:
        raise ValueError(
            f"EMD needs equal-shape [B,N,3] clouds, got {p.shape} vs {q.shape}"
        )
    pp = _poison_rank_matched(p, p_mask)
    qp = _poison_rank_matched(q, q_mask)
    dist, assign = _emd_sharded(pp, qp, float(eps), int(max_iters), mesh,
                                points_axis)
    if p_mask is not None:
        dist = jnp.where(p_mask, dist, 0.0)
        assign = jnp.where(p_mask, assign, 0)
    return dist, assign


def three_interpolate_sharded(features, idx, weight, mesh, *,
                              points_axis: str = "points"):
    """FP-layer feature interpolation with target rows sharded over the
    points axis (features [B, M, C] replicated; idx/weight [B, N, 3]
    sharded over N).  Forward is communication-free; the backward's
    per-device scatter-add partials merge via the shard_map-inserted
    psum, exactly as in :func:`group_points_sharded`."""
    from pytorch_points_tpu.ops.interpolate import three_interpolate

    def impl(f_full, idx_shard, w_shard):
        return three_interpolate(f_full, idx_shard, w_shard)

    return jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), P(None, points_axis, None),
                  P(None, points_axis, None)),
        out_specs=P(None, points_axis, None),
        check_vma=False,
    )(features, idx, weight)


def sample_and_group_sharded(
    xyz,
    features,
    npoint: int,
    nsample: int,
    radius: float,
    mesh,
    *,
    use_xyz: bool = True,
    normalize_radius: bool = False,
    mask=None,
    points_axis: str = "points",
):
    """The full SA front-end (FPS -> ball query -> group -> center) as one
    SPMD composition over the points axis — the model-level counterpart
    of the per-op sharded variants (SURVEY.md §3.3, §6).

    FPS runs on the N-sharded support (per-step communication is the
    O(ndev*B) two-level argmax combine); the query stages shard the
    npoint centroids instead (communication-free forwards; feature-grad
    partials psum-merge in the backward).  Outputs match
    :func:`pytorch_points_tpu.ops.sample_and_group` exactly — same
    indices (bitwise, lowest-index ties) and values — with the
    [B, npoint, nsample, C] tensors sharded over npoint.

    Only ball-query grouping is offered (radius required): kNN grouping
    has no sharded variant yet.
    """
    idx_fps = furthest_point_sample_sharded(
        xyz, npoint, mesh, mask, points_axis=points_axis
    )
    new_xyz = jnp.take_along_axis(xyz, idx_fps[..., None], axis=1)
    idx, _ = ball_query_sharded(
        xyz, new_xyz, radius, nsample, mesh, mask, points_axis=points_axis
    )
    grouped_xyz = group_points_sharded(
        xyz, idx, mesh, points_axis=points_axis
    )
    centered = grouped_xyz - new_xyz[:, :, None, :]
    if normalize_radius:
        centered = centered / radius
    if features is not None:
        grouped_features = group_points_sharded(
            features, idx, mesh, points_axis=points_axis
        )
        if use_xyz:
            new_features = jnp.concatenate(
                [centered, grouped_features], axis=-1
            )
        else:
            new_features = grouped_features
    else:
        new_features = centered
    return new_xyz, new_features, idx, grouped_xyz


def knn_sharded(query, support, k: int, mesh, support_mask=None, *,
                points_axis: str = "points"):
    """kNN with the QUERY set sharded over the points axis (support
    replicated, forward communication-free — the same partitioning as
    :func:`ball_query_sharded`).  Completes the sharded family: every op
    wrapper in ops/ now has an SPMD variant.

    Returns (dist [B, Nq, k], idx [B, Nq, k]) sharded over Nq, equal to
    the single-device :func:`pytorch_points_tpu.ops.knn`."""
    from pytorch_points_tpu.ops.grouping import knn

    if support_mask is None:
        def impl0(q_shard, s_full):
            return knn(q_shard, s_full, k)

        return jax.shard_map(
            impl0,
            mesh=mesh,
            in_specs=(P(None, points_axis, None), P()),
            out_specs=(P(None, points_axis, None),
                       P(None, points_axis, None)),
            check_vma=False,
        )(query, support)

    def impl1(q_shard, s_full, m_full):
        return knn(q_shard, s_full, k, support_mask=m_full)

    return jax.shard_map(
        impl1,
        mesh=mesh,
        in_specs=(P(None, points_axis, None), P(), P()),
        out_specs=(P(None, points_axis, None), P(None, points_axis, None)),
        check_vma=False,
    )(query, support, support_mask)
