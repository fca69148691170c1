"""Auction-based Earth Mover's Distance.

Reference semantics (SURVEY.md §4.5, BASELINE.json:10): approximate optimal
1-to-1 assignment between two equal-size clouds via the Bertsekas auction
algorithm (fixed iteration budget, eps-controlled bid increments); the loss
is the per-point squared distance along the matched pairs, and the backward
flows gradients along the matched pairs only (assignment treated as locally
constant).

TPU-native design (Pallas path, kernels/auction.py): Gauss-Seidel auction
sweeps entirely on-chip, then a JV shortest-augmenting-path endgame for
budget-exhausted stragglers — the result is a complete permutation within
n*eps of the optimal cost whenever the endgame pop cap doesn't bind.
The XLA fallback below is a correctness-only flat-eps Jacobi loop with
chunked top-2 scans (no [B,N,N] temporaries) and a greedy completion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pytorch_points_tpu.ops.pairwise import pairwise_sqdist

_NEG = jnp.float32(-1e30)


def _auction_xla(p, q, eps, max_iters):
    b, n, _ = p.shape
    barange = jnp.arange(b)[:, None]
    person_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    obj_ids = person_ids

    # Person-chunked top-2: never materializes a [B, N, N] plane per
    # iteration (that cost ~0.5 GB/iteration at B=32 N=2048) — distances
    # are recomputed from coordinates per [B, cs, N] chunk.
    cs = n
    for cand in (512, 256, 128):
        if n > 1024 and n % cand == 0:
            cs = cand
            break

    def top2_fn(price):
        if cs == n:
            net = -pairwise_sqdist(p, q) - price[:, None, :]
            return jax.lax.top_k(net, 2)
        pc = jnp.transpose(
            p.reshape(b, n // cs, cs, 3), (1, 0, 2, 3)
        )  # [C, B, cs, 3]

        def f(pck):
            net = -pairwise_sqdist(pck, q) - price[:, None, :]
            return jax.lax.top_k(net, 2)

        t2, ti = jax.lax.map(f, pc)  # [C, B, cs, 2]
        merge = lambda x: jnp.transpose(x, (1, 0, 2, 3)).reshape(b, n, 2)
        return merge(t2), merge(ti)

    def cond(state):
        it, assign, _, _ = state
        return jnp.logical_and(it < max_iters, jnp.any(assign < 0))

    def body(state):
        it, assign, owner, price = state
        top2, top2_idx = top2_fn(price)
        v1 = top2[..., 0]
        v2 = top2[..., 1]
        target = top2_idx[..., 0].astype(jnp.int32)  # [B, N] object each person wants
        bid = jnp.take_along_axis(price, target, axis=1) + (
            v1 - v2
        ) + eps
        bidding = assign < 0
        bid = jnp.where(bidding, bid, _NEG)
        # Per-object max bid (deterministic scatter-max), then winner =
        # lowest-index person achieving it.
        best = jnp.full((b, n), _NEG).at[barange, target].max(bid)
        my_best = jnp.take_along_axis(best, target, axis=1)
        is_win = jnp.logical_and(bidding, bid >= my_best)
        winner = (
            jnp.full((b, n), n, dtype=jnp.int32)
            .at[barange, target]
            .min(jnp.where(is_win, person_ids, n))
        )
        has_bid = winner < n
        winner_c = jnp.minimum(winner, n - 1)
        # Objects with bids: bump price, evict previous owner, set new owner.
        price = jnp.where(has_bid, best, price)
        prev_owner = jnp.where(has_bid, owner, -1)
        # Evict: persons listed in prev_owner (>=0) lose their object.
        evict_slot = jnp.where(prev_owner >= 0, prev_owner, n)
        assign = assign.at[barange, evict_slot].set(-1, mode="drop")
        # Assign winners (each winning person bid on exactly one object).
        winner_slot = jnp.where(has_bid, winner_c, n)
        assign = assign.at[barange, winner_slot].set(obj_ids, mode="drop")
        owner = jnp.where(has_bid, winner_c, owner)
        return it + 1, assign, owner, price

    init = (
        jnp.int32(0),
        jnp.full((b, n), -1, jnp.int32),  # person -> object
        jnp.full((b, n), -1, jnp.int32),  # object -> person
        jnp.zeros((b, n), jnp.float32),  # object prices
    )
    _, assign, owner, _ = jax.lax.while_loop(cond, body, init)

    # Greedy cleanup: complete the permutation one assignment per step.
    def c_cond(state):
        _, assign, _ = state
        return jnp.any(assign < 0)

    def c_body(state):
        it, assign, owner = state
        unassigned_p = assign < 0  # [B, N]
        pi = jnp.argmax(unassigned_p, axis=1).astype(jnp.int32)  # first unassigned
        psel = jnp.take_along_axis(p, pi[:, None, None], axis=1)  # [B,1,3]
        row = -jnp.sum((psel - q) ** 2, axis=-1)  # [B, N] benefit row
        free_obj = owner < 0
        masked = jnp.where(free_obj, row, _NEG)
        oj = jnp.argmax(masked, axis=1).astype(jnp.int32)
        do = jnp.any(unassigned_p, axis=1)  # only act on unfinished batches
        p_slot = jnp.where(do, pi, n)
        o_slot = jnp.where(do, oj, n)
        assign = assign.at[barange[:, 0], p_slot].set(oj, mode="drop")
        owner = owner.at[barange[:, 0], o_slot].set(pi, mode="drop")
        return it + 1, assign, owner

    _, assign, owner = jax.lax.while_loop(c_cond, c_body, (jnp.int32(0), assign, owner))
    return assign


def _emd_forward(p, q, eps, max_iters, phases, impl, pop_cap):
    from pytorch_points_tpu.kernels import dispatch

    resolved = dispatch.resolve(impl, "emd")
    if resolved == "pallas":
        from pytorch_points_tpu.kernels import auction

        return auction.auction_assignment(p, q, eps, max_iters,
                                          phases=phases, pop_cap=pop_cap)
    # XLA fallback ignores eps-scaling (single flat-eps run + greedy
    # completion) — correctness path only.
    return _auction_xla(p, q, eps, max_iters * phases)


def _matched_sqdist(p, q, assign):
    qsel = jnp.take_along_axis(q, assign[..., None], axis=1)
    return jnp.sum((p - qsel) ** 2, axis=-1), qsel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _emd(p, q, eps, max_iters, phases, impl, pop_cap):
    assign = _emd_forward(p, q, eps, max_iters, phases, impl, pop_cap)
    dist, _ = _matched_sqdist(p, q, assign)
    return dist, assign


def _emd_fwd(p, q, eps, max_iters, phases, impl, pop_cap):
    assign = _emd_forward(p, q, eps, max_iters, phases, impl, pop_cap)
    dist, qsel = _matched_sqdist(p, q, assign)
    return (dist, assign), (p, q, assign, qsel)


def _emd_bwd(eps, max_iters, phases, impl, pop_cap, res, g):
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    p, q, assign, qsel = res
    g_dist, _ = g
    diff = p - qsel
    gp = 2.0 * g_dist[..., None] * diff
    gq = scatter_add_auto(assign, -gp, q.shape[-2])
    return gp, gq


_emd.defvjp(_emd_fwd, _emd_bwd)


def _poison_rank_matched(x, mask):
    """Replace invalid points with twin pads shared BY RANK between the
    two clouds: the r-th invalid slot of p and the r-th invalid slot of q
    get IDENTICAL far-away coordinates, so the auction matches pad r to
    pad r at distance 0 and the valid<->valid assignment is undisturbed.
    Offsets are disjoint from the kernel's own alignment padding
    (BIG_COORD*8 family in kernels/auction.py)."""
    if mask is None:
        return x
    r = jnp.cumsum(~mask, axis=1) - 1  # rank among invalid slots
    from pytorch_points_tpu.core.masking import BIG_COORD

    offs = BIG_COORD * 16.0 + 32.0 * r.astype(x.dtype)
    poison = jnp.zeros_like(x).at[..., 0].set(offs)
    return jnp.where(mask[..., None], x, poison)


def earth_mover_distance(
    p,
    q,
    eps: float = 0.005,
    max_iters: int = 15,
    phases: int = 3,
    impl: str = "auto",
    endgame_pop_cap: int = 768,
    p_mask=None,
    q_mask=None,
):
    """Auction-approximated EMD between paired equal-size clouds.

    Args:
      p: [B, N, 3] predicted cloud.
      q: [B, N, 3] target cloud (same N).
      eps: auction bid increment — smaller = closer to the optimal
        assignment but more iterations to converge.
      endgame_pop_cap: Dijkstra scan budget per straggler in the JV
        endgame; lower = faster, less optimal.  With the default
        column-reduction warm start (B=32 N=2048 normal clouds,
        bench/probe_r4_emdq3.py): 768 -> +0.93% mean / 1.52% max of
        optimal at 63.6 ms, 384 -> +2.15%/3.83% at 50.1 ms; on
        correlated train pairs (B=16): 768 -> +0.10% at 56.7 ms,
        384 -> +0.19% at 45.8 ms.  Endgame time is data-dependent:
        spatially correlated clouds (a model's early-training output vs
        its input) cost ~2-3x random clouds.
      max_iters: per-phase auction iteration budget.  On the Pallas path,
        persons left unassigned at the budget are finished by JV
        shortest-augmenting-paths at the final eps (kernels/auction.py
        _augment_kernel) — never greedily — so quality degrades gracefully
        as the budget shrinks.
      phases: eps-scaling phases (phase k bids with eps*6^(phases-1-k),
        finishing at eps); >1 converges far faster for the same quality.
        The Pallas path honors this; the XLA fallback runs a single
        flat-eps auction with the combined budget plus a greedy completion
        (correctness path only).

        Measured on v5e at B=32 N=2048 (mean matched d^2 vs the Hungarian
        optimum, warm-started defaults): standard normal clouds ~64 ms at
        +0.93%; gaussian-mixture (clustered) clouds ~218 ms at ~+0.1%.
        Round-1 defaults (greedy completion) were +63% on normal clouds —
        the JV endgame is what makes small budgets usable.

    Masked/bucketed clouds: pass ``p_mask``/``q_mask`` ([B, N] bool,
    True = real point).  The two clouds must have EQUAL VALID COUNTS per
    batch element (EMD is a 1-to-1 matching; this mirrors the
    reference's equal-size contract on the valid sets).  Invalid slots
    are rank-matched to each other at distance 0, so they contribute
    nothing to cost or gradient; masked outputs are (dist 0, index 0).

    Returns:
      (dist [B, N] squared distances along matched pairs,
       assignment [B, N] int32 permutation: p[i] <-> q[assignment[i]]).
    """
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    if p.shape != q.shape or p.ndim != 3:
        raise ValueError(f"EMD needs equal-shape [B,N,3] clouds, got {p.shape} vs {q.shape}")
    if p_mask is not None or q_mask is not None:
        pp = _poison_rank_matched(p, p_mask)
        qp = _poison_rank_matched(q, q_mask)
        dist, assign = _emd(pp, qp, float(eps), int(max_iters), int(phases),
                            impl, int(endgame_pop_cap))
        if p_mask is not None:
            dist = jnp.where(p_mask, dist, 0.0)
            assign = jnp.where(p_mask, assign, 0)
        return dist, assign
    return _emd(p, q, float(eps), int(max_iters), int(phases), impl,
                int(endgame_pop_cap))
