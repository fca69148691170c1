"""Pallas auction-EMD kernel (SURVEY.md §3.1 N2, §4.5 — the hardest kernel).

Bertsekas auction assignment between two equal-size clouds, entirely
on-chip.  TPU mapping decisions (vs the reference's CUDA bid/assign kernel
pair):

  * One batch element per grid step; the whole auction ``while_loop`` runs
    inside the kernel with coordinates, prices and the object->person
    ``owner`` array resident in VMEM.
  * Benefits (-d^2) are recomputed on the fly from coordinates per
    iteration (9 VPU flops/pair) rather than materialized: a [N, N] f32
    benefit matrix would not fit VMEM at N=2048 and streaming it from HBM
    would cost more than recompute.
  * Persons are processed in [tI, N] chunks: net value, top-2, bid, and
    per-object bid resolution are all plane-wide VPU ops.  There are NO
    scatters anywhere: the only persistent state is ``owner`` (object ->
    person); per-person assigned flags are re-derived each iteration as a
    lane reduction, and the final person->object assignment is a min
    reduction at the end.
  * All argmax/argmin ties resolve to the lowest index (within chunks via
    iota+where+min, across chunks via strict compare), so results are
    deterministic and batch-order independent.

Persons left unassigned at the iteration budget (possible with a small
budget, matching the reference's fixed-iteration semantics) are completed
by the wrapper greedily by index order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_points_tpu.core.masking import BIG_COORD
from pytorch_points_tpu.kernels.dispatch import interpret_mode

_IDX_BIG = 2**30
_NEG = -1.0e30


def _auction_kernel(ps_ref, qt_ref, out_ref, price_s, owner_s, bid_s, win_s,
                    ben_s, *, eps, max_iters, ti, n, phases, scale,
                    cache_benefit):
    nchunks = n // ti

    price_s[:] = jnp.zeros_like(price_s)

    def _compute_benefit(ci):
        pc = ps_ref[0, pl.ds(ci * ti, ti), :]  # [tI, 8]
        qt = qt_ref[0]  # [8, N]
        d2 = jnp.zeros((ti, n), jnp.float32)
        for c in range(3):
            diff = pc[:, c : c + 1] - qt[c : c + 1, :]
            d2 = d2 + diff * diff
        return -d2

    if cache_benefit:
        # v5e has ~128 MB VMEM: the whole [N, N] benefit matrix stays
        # on-chip for the auction's lifetime (16 MB at N=2048), saving the
        # 9-flop/pair recompute every iteration (~1/3 of iteration cost).
        def warm(ci, _):
            ben_s[pl.ds(ci * ti, ti), :] = _compute_benefit(ci)
            return 0

        jax.lax.fori_loop(0, nchunks, warm, 0)

    def person_chunk(ci, eps_k):
        if cache_benefit:
            benefit = ben_s[pl.ds(ci * ti, ti), :]
        else:
            benefit = _compute_benefit(ci)
        net = benefit - price_s[:]  # [tI, N]

        lane = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)
        v1 = jnp.max(net, axis=1, keepdims=True)  # [tI,1]
        a1 = jnp.min(
            jnp.where(net == v1, lane, _IDX_BIG), axis=1, keepdims=True
        )  # lowest-index argmax
        sel = lane == a1
        b1 = jnp.max(jnp.where(sel, benefit, _NEG), axis=1, keepdims=True)
        v2 = jnp.max(jnp.where(sel, _NEG, net), axis=1, keepdims=True)
        bid = b1 - v2 + eps_k  # = price[a1] + v1 - v2 + eps

        # Assigned persons don't bid.
        pidx = jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0) + ci * ti
        owned_by_me = owner_s[:] == pidx  # [tI, N]
        assigned = jnp.max(
            jnp.where(owned_by_me, 1, 0), axis=1, keepdims=True
        )
        bid = jnp.where(assigned == 1, _NEG, bid)

        # Per-object best bid within this chunk, then combine with running.
        contrib = jnp.where(sel, bid, _NEG)  # [tI, N]
        cbest = jnp.max(contrib, axis=0, keepdims=True)  # [1, N]
        cwin = jnp.min(
            jnp.where(contrib == cbest, pidx, _IDX_BIG), axis=0, keepdims=True
        )
        better = cbest > bid_s[:]
        bid_s[:] = jnp.where(better, cbest, bid_s[:])
        win_s[:] = jnp.where(better, cwin, win_s[:])
        return eps_k

    def iter_body(state):
        it, _, eps_k = state
        bid_s[:] = jnp.full_like(bid_s, _NEG)
        win_s[:] = jnp.full_like(win_s, _IDX_BIG)
        jax.lax.fori_loop(0, nchunks, person_chunk, eps_k)
        has = bid_s[:] > _NEG
        price_s[:] = jnp.where(has, bid_s[:], price_s[:])
        owner_s[:] = jnp.where(has, win_s[:], owner_s[:])
        done = jnp.min(owner_s[:]) >= 0
        return it + 1, done, eps_k

    def iter_cond(state):
        it, done, _ = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    # Bertsekas eps-scaling: early phases with coarse eps converge in a
    # handful of iterations and leave near-optimal prices as a warm start
    # for the final, fine-eps phase (assignment resets between phases,
    # prices carry over).
    def phase(_, eps_k):
        owner_s[:] = jnp.full_like(owner_s, -1)
        jax.lax.while_loop(iter_cond, iter_body, (jnp.int32(0), False, eps_k))
        return eps_k / scale  # next phase refines (Mosaic has no powf)

    eps0 = jnp.float32(eps * scale ** (phases - 1))
    jax.lax.fori_loop(0, phases, phase, eps0)

    # Emit the object->person map (lane-major, zero-copy); the wrapper
    # inverts it to person->object with one XLA scatter.
    out_ref[0] = owner_s[:]


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(
    jax.jit, static_argnames=("eps", "max_iters", "ti", "phases", "scale")
)
def auction_assignment(p, q, eps: float, max_iters: int, ti: int = 256,
                       phases: int = 1, scale: float = 6.0):
    """[B,N,3] x2 -> person->object assignment [B,N] int32 (permutation).

    ``phases > 1`` enables eps-scaling (phase k uses eps*scale^(phases-1-k),
    ending at eps) — much faster convergence to the same eps-optimality;
    ``max_iters`` is the per-phase budget."""
    # Integer-only outputs: sever the tangent path (no AD rules needed).
    p = jax.lax.stop_gradient(jnp.asarray(p, jnp.float32))
    q = jax.lax.stop_gradient(jnp.asarray(q, jnp.float32))
    b, n, _ = p.shape

    n_pad = _round_up(n, max(ti, 128))
    if n_pad != n:
        # Pad both clouds with IDENTICAL far-away points: each padded person
        # is distance-0 from its twin object and astronomically far from
        # everything else, so the auction matches pads to pads.
        pad = n_pad - n
        offs = BIG_COORD * 8.0 + 16.0 * jnp.arange(pad, dtype=jnp.float32)
        pp = jnp.zeros((b, pad, 3), jnp.float32).at[:, :, 0].set(offs[None])
        p = jnp.concatenate([p, pp], axis=1)
        q = jnp.concatenate([q, pp], axis=1)

    ps = jnp.pad(p, ((0, 0), (0, 0), (0, 5)))  # [B, N', 8] sublane side
    qt = jnp.transpose(jnp.pad(q, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))

    # Whole-benefit VMEM residency when it fits comfortably (<= 96 MB).
    cache_benefit = n_pad * n_pad * 4 <= 96 * 1024 * 1024
    out = pl.pallas_call(
        functools.partial(
            _auction_kernel,
            eps=float(eps),
            max_iters=int(max_iters),
            ti=ti,
            n=n_pad,
            phases=int(phases),
            scale=float(scale),
            cache_benefit=cache_benefit,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 8), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),  # price
            pltpu.VMEM((1, n_pad), jnp.int32),  # owner
            pltpu.VMEM((1, n_pad), jnp.float32),  # round best bid
            pltpu.VMEM((1, n_pad), jnp.int32),  # round winner
            pltpu.VMEM(
                (n_pad if cache_benefit else 8, n_pad), jnp.float32
            ),  # benefit cache
        ],
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem limit is 16 MB; the resident benefit
            # matrix plus working planes need more (v5e VMEM is 128 MB)
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=27 * b * n_pad * n_pad * min(max_iters, 100),
            bytes_accessed=4 * b * n_pad * 18,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(ps, qt)
    owner = out[:, 0, :]  # [B, N'] object -> person (-1 = unowned)
    # Invert to person -> object; persons never appearing stay _IDX_BIG.
    assign_full = jnp.full((b, n_pad + 1), _IDX_BIG, jnp.int32)
    slot = jnp.where(owner >= 0, owner, n_pad)
    assign_full = assign_full.at[jnp.arange(b)[:, None], slot].set(
        jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32), (b, n_pad))
    )
    assign = assign_full[:, :n]

    # Complete any leftover persons (iteration budget exhausted) greedily:
    # first unassigned person per batch takes its nearest free object, one
    # per step per batch — distance rows computed on the fly (no [B,N,N]).
    p_real = p[:, :n]
    q_real = q[:, :n]
    barange = jnp.arange(b)

    def c_cond(state):
        assign, _ = state
        return jnp.any(assign >= n)

    def c_body(state):
        assign, owned = state
        un = assign >= n
        pi = jnp.argmax(un, axis=1).astype(jnp.int32)  # first unassigned
        psel = jnp.take_along_axis(p_real, pi[:, None, None], axis=1)
        row = -jnp.sum((psel - q_real) ** 2, axis=-1)  # [B, N] benefit
        masked = jnp.where(owned, _NEG, row)
        oj = jnp.argmax(masked, axis=1).astype(jnp.int32)
        do = jnp.any(un, axis=1)
        p_slot = jnp.where(do, pi, n)
        o_slot = jnp.where(do, oj, n)
        assign = assign.at[barange, p_slot].set(oj, mode="drop")
        owned = owned.at[barange, o_slot].set(True, mode="drop")
        return assign, owned

    owned = jnp.zeros((b, n), bool)
    safe = jnp.where(assign < n, assign, n)
    owned = owned.at[barange[:, None], safe].set(True, mode="drop")
    assign, _ = jax.lax.while_loop(c_cond, c_body, (assign, owned))
    return assign
