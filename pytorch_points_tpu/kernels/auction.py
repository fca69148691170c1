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


def _auction_kernel(ps_ref, qt_ref, out_ref, price_ref, price_s, owner_s,
                    ben_s, *, eps, max_iters, ti, n, phases, scale,
                    cache_benefit, budgets=(), warm_start=False):
    nchunks = n // ti

    price_s[:] = jnp.full_like(price_s, _NEG if warm_start else 0.0)

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
        def fill_cache(ci, _):
            ben = _compute_benefit(ci)
            ben_s[pl.ds(ci * ti, ti), :] = ben
            if warm_start:
                price_s[:] = jnp.maximum(
                    price_s[:], jnp.max(ben, axis=0, keepdims=True)
                )
            return 0

        jax.lax.fori_loop(0, nchunks, fill_cache, 0)
    elif warm_start:
        # one extra benefit pass (~1 auction iteration's cost)
        def warm_fold(ci, _):
            price_s[:] = jnp.maximum(
                price_s[:],
                jnp.max(_compute_benefit(ci), axis=0, keepdims=True),
            )
            return 0

        jax.lax.fori_loop(0, nchunks, warm_fold, 0)

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

        # Resolve this chunk's bids IMMEDIATELY (Gauss-Seidel sweep:
        # later chunks bid against the updated prices, which converges in
        # far fewer rounds than resolving all chunks' bids at once —
        # bidding waves don't trample each other within an iteration).
        contrib = jnp.where(sel, bid, _NEG)  # [tI, N]
        cbest = jnp.max(contrib, axis=0, keepdims=True)  # [1, N]
        cwin = jnp.min(
            jnp.where(contrib == cbest, pidx, _IDX_BIG), axis=0, keepdims=True
        )
        has = cbest > _NEG
        price_s[:] = jnp.where(has, cbest, price_s[:])
        owner_s[:] = jnp.where(has, cwin, owner_s[:])
        return eps_k

    def iter_body(state):
        it, _, eps_k, bound = state
        jax.lax.fori_loop(0, nchunks, person_chunk, eps_k)
        done = jnp.min(owner_s[:]) >= 0
        return it + 1, done, eps_k, bound

    def iter_cond(state):
        it, done, _, bound = state
        return jnp.logical_and(it < bound, jnp.logical_not(done))

    # Bertsekas eps-scaling: early phases with coarse eps converge in a
    # handful of iterations and leave near-optimal prices as a warm start
    # for the final, fine-eps phase (assignment resets between phases,
    # prices carry over).
    #
    # PER-PHASE budgets (static unroll — ``phases`` is small): each phase
    # gets budgets[ph], defaulting to max_iters.  Under-converged phases
    # are the root cause of the correlated-cloud straggler flood the JV
    # endgame then pays ~0.3 ms each for, but phases do NOT reliably
    # converge early (random clouds churn at every eps), so budget is a
    # real per-phase knob, not a free headroom (measured:
    # bench/probe_r3_emd_sweep.py / probe_r3_emd_phase.py).
    eps_k = float(eps * scale ** (phases - 1))
    for ph in range(phases):
        bound = jnp.int32(budgets[ph] if ph < len(budgets) else max_iters)
        owner_s[:] = jnp.full_like(owner_s, -1)
        jax.lax.while_loop(
            iter_cond, iter_body,
            (jnp.int32(0), False, jnp.float32(eps_k), bound),
        )
        eps_k = eps_k / scale  # next phase refines

    # Emit the object->person map (lane-major, zero-copy); the wrapper
    # inverts it to person->object with one XLA scatter.
    out_ref[0] = owner_s[:]
    price_ref[0] = price_s[:]


def _round_up(v, m):
    return -(-v // m) * m


def _augment_kernel(ids_ref, px_ref, qx_ref, owner_in, price_in,
                    owner_out, price_out, dist_s, pred_s, scan_s, qn_s,
                    *, eps, n, s_max, b, pop_cap):
    """JV shortest-augmenting-path endgame for the auction's stragglers.

    The auction's endgame is its known pathology: an unassigned person
    must push an eviction chain to a free object via eps-increment price
    wars (thousands of iterations).  A shortest augmenting path in the
    reduced-cost graph resolves the same chain in ONE Dijkstra pass
    (this is exactly how LAPJV completes an auction-style initialization).

    Everything is batch-plane parallel: one [B, N] plane per state array,
    all B batch elements run their Dijkstra simultaneously (per-batch
    scalars live in [B, 1] columns).  Straggler s of every batch is
    augmented in lock-step; batches with fewer stragglers mask out.

    Duals: v[j] = -price[j].  Auction eps-CS gives reduced-cost edges
    >= -eps, so each relax adds +eps (weights become nonnegative);
    the completed assignment stays within n*eps of optimal — validated
    against the Hungarian oracle in tests/test_emd.py.
    """
    owner_out[:] = owner_in[:]  # [B, N]
    price_out[:] = price_in[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    INF = jnp.float32(1e30)

    def at_lanes_eq(eq, plane):
        """one-hot [B,N] x plane [B,N] -> selected scalar column [B,1]."""
        return jnp.sum(jnp.where(eq, plane, 0), axis=1, keepdims=True)

    def at_lanes(plane, jcol):
        """plane [B,N], jcol [B,1] -> plane[batch, jcol[batch]] as [B,1]."""
        return at_lanes_eq(lane == jcol, plane)

    # qsq + price is constant through one slot's Dijkstra (the dual bump
    # happens after the pop loop), so the net cost row of person i is
    # ci_net[j] = psq_i + qn[j] - 2 p_i.q_j with qn refreshed per slot —
    # the dot form drops the per-pop row rebuild from 17 to ~14 plane ops
    # (the VPU mul/adds here are plain f32, not the unsound bf16x3 MXU
    # path the chamfer bounds had to avoid).
    qsq = (
        qx_ref[0] * qx_ref[0]
        + qx_ref[1] * qx_ref[1]
        + qx_ref[2] * qx_ref[2]
    )

    def crow_net_of(icol):
        """Net cost row of person icol: c[i,:] + price, as [B,N]."""
        onehot = lane == icol
        pix = at_lanes_eq(onehot, px_ref[0])
        piy = at_lanes_eq(onehot, px_ref[1])
        piz = at_lanes_eq(onehot, px_ref[2])
        psq = pix * pix + piy * piy + piz * piz  # [B,1] column ops
        dot = pix * qx_ref[0] + piy * qx_ref[1] + piz * qx_ref[2]
        return (qn_s[:] - 2.0 * dot) + psq

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (b, ids_ref.shape[1]), 1)

    def slot_body(s, _):
        qn_s[:] = qsq + price_out[:]
        # one-hot lane select (dynamic lane slicing is not Mosaic-legal)
        i0 = jnp.sum(jnp.where(iota_s == s, ids_ref[:], 0), axis=1,
                     keepdims=True)  # [B,1]
        valid = i0 < _IDX_BIG
        i0c = jnp.minimum(i0, n - 1)
        # dist[j] = c[i0,j] - v[j] = c + price
        dist_s[:] = jnp.where(valid, crow_net_of(i0c), INF)
        pred_s[:] = jnp.full((b, n), -1, jnp.int32)
        scan_s[:] = jnp.zeros((b, n), jnp.int32)

        def pop_cond(st):
            active, _, _, it = st
            return jnp.logical_and(jnp.max(active) == 1, it < pop_cap)

        def pop_body(st):
            # carried masks are int32 [B,1]: Mosaic cannot carry i1 vectors
            active, jstar, dstar, it = st
            active_b = active == 1
            m = jnp.where(scan_s[:] == 1, INF, dist_s[:])
            d = jnp.min(m, axis=1, keepdims=True)  # [B,1]
            j = jnp.min(jnp.where(m == d, lane, _IDX_BIG), axis=1,
                        keepdims=True)
            j = jnp.minimum(j, n - 1)
            # frozen batches keep their recorded (jstar, dstar)
            jstar = jnp.where(active_b, j, jstar)
            dstar = jnp.where(active_b, d, dstar)
            eqj = lane == jstar  # shared by the three jstar-column reads
            own_at = at_lanes_eq(eqj, owner_out[:])  # [B,1]
            found = own_at < 0
            still = jnp.logical_and(active_b, jnp.logical_not(found))
            # scan jstar for still-active batches
            scan_s[:] = jnp.where(
                jnp.logical_and(eqj, still), 1, scan_s[:]
            )
            # relax through the owner's row
            i = jnp.maximum(own_at, 0)
            ci_net = crow_net_of(i)  # [B,N]
            base = dstar - at_lanes_eq(eqj, ci_net) + eps  # [B,1]
            cand = base + ci_net
            improve = jnp.logical_and(
                jnp.logical_and(still, scan_s[:] == 0), cand < dist_s[:]
            )
            dist_s[:] = jnp.where(improve, cand, dist_s[:])
            pred_s[:] = jnp.where(improve, jstar, pred_s[:])
            return still.astype(jnp.int32), jstar, dstar, it + 1

        active0 = valid.astype(jnp.int32)
        left, jstar, dstar = jax.lax.while_loop(
            pop_cond, pop_body,
            (active0, jnp.zeros((b, 1), jnp.int32),
             jnp.zeros((b, 1), jnp.float32), jnp.int32(0)),
        )[:3]

        # Pop-cap fallback: batches that hit the cap before popping a free
        # object augment to the best CURRENTLY-reachable free object (its
        # dist was relaxed through the scanned region).  Slightly
        # suboptimal for that one path, but keeps the endgame O(pop_cap)
        # per straggler; quality is guarded by the bench oracle metric.
        capped = left == 1
        free_dist = jnp.where(owner_out[:] < 0, dist_s[:], INF)
        dfree = jnp.min(free_dist, axis=1, keepdims=True)
        jfree = jnp.minimum(
            jnp.min(jnp.where(free_dist == dfree, lane, _IDX_BIG), axis=1,
                    keepdims=True),
            n - 1,
        )
        jstar = jnp.where(capped, jfree, jstar)
        dstar = jnp.where(capped, dfree, dstar)

        # dual update on scanned columns: v[j] += dist[j] - d*  i.e.
        # price[j] += d* - dist[j]  (>= 0: prices only rise)
        bump = jnp.maximum(dstar - dist_s[:], 0.0)
        price_out[:] = jnp.where(
            jnp.logical_and(scan_s[:] == 1, valid),
            price_out[:] + bump, price_out[:],
        )

        # augment: flip the path from jstar back to i0
        def flip_cond(st):
            walking, _ = st
            return jnp.max(walking) == 1

        def flip_body(st):
            walking, jcur = st
            walk_b = walking == 1
            pj = at_lanes(pred_s[:], jcur)  # [B,1] predecessor column
            newval = jnp.where(
                pj < 0, i0, at_lanes(owner_out[:], jnp.maximum(pj, 0))
            )
            owner_out[:] = jnp.where(
                jnp.logical_and(lane == jcur, walk_b), newval, owner_out[:]
            )
            cont = jnp.logical_and(walk_b, pj >= 0)
            return cont.astype(jnp.int32), jnp.maximum(pj, 0)

        jax.lax.while_loop(
            flip_cond, flip_body, (valid.astype(jnp.int32), jstar)
        )
        return 0

    jax.lax.fori_loop(0, s_max, slot_body, 0)


def _residual_rounds(owner, price, p, q, eps, n, s_max=256, max_rounds=16,
                     pop_cap=768):
    """Complete the assignment via JV augmenting paths (_augment_kernel).

    One kernel call resolves up to s_max stragglers per batch element;
    extra rounds only pick up capacity overflow.  The round cap is a
    safety backstop (the caller falls back to greedy completion past it)."""
    b, n_pad = owner.shape
    s_max = min(s_max, n_pad)
    barange = jnp.arange(b)
    px = jnp.transpose(p, (2, 0, 1))  # [3, B, N'] coordinate planes
    qx = jnp.transpose(q, (2, 0, 1))
    iota_f = jnp.arange(n_pad, dtype=jnp.float32)

    def unassigned_flags(owner):
        slot = jnp.where(owner >= 0, owner, n_pad)
        present = (
            jnp.zeros((b, n_pad + 1), bool)
            .at[barange[:, None], slot]
            .set(True, mode="drop")
        )
        return ~present[:, :n_pad]  # [B, N'] person has no object

    def cond(state):
        owner, _, r = state
        return jnp.logical_and(r < max_rounds, jnp.any(owner < 0))

    def body(state):
        owner, price, r = state
        un = unassigned_flags(owner)
        # lowest-index unassigned persons first, capacity s_max
        keys = jnp.where(un, -iota_f, -jnp.float32(2**40))
        vals, _ = jax.lax.top_k(keys, s_max)
        ok = vals > -jnp.float32(2**39)
        ids = jnp.where(ok, (-vals).astype(jnp.int32), _IDX_BIG)  # [B, S]
        owner2, price2 = pl.pallas_call(
            functools.partial(
                _augment_kernel, eps=float(eps), n=n_pad, s_max=s_max, b=b,
                pop_cap=pop_cap,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((b, n_pad), jnp.float32),  # dist
                pltpu.VMEM((b, n_pad), jnp.int32),  # pred
                pltpu.VMEM((b, n_pad), jnp.int32),  # scanned
                pltpu.VMEM((b, n_pad), jnp.float32),  # qsq + price per slot
            ],
            cost_estimate=pl.CostEstimate(
                flops=20 * b * s_max * n_pad * 64,
                bytes_accessed=4 * b * n_pad * 12,
                transcendentals=0,
            ),
            interpret=interpret_mode(),
        )(ids, px, qx, owner, price)
        return owner2, price2, r + 1

    owner, price, _ = jax.lax.while_loop(
        cond, body, (owner, price, jnp.int32(0))
    )
    return owner


def _auction_owner(p, q, eps, max_iters, ti, phases, scale, budgets=(),
                   warm_start=False):
    """Run the on-chip auction; returns (owner [B,N'] object->person,
    padded p, padded q).  -1 in owner = object never bid on (its person
    partner is left for the completion pass)."""
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
            budgets=tuple(int(v) for v in budgets),
            warm_start=bool(warm_start),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 8), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),  # price
            pltpu.VMEM((1, n_pad), jnp.int32),  # owner
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
    owner, price = out
    # [B, N'] object -> person (-1 = unowned), final object prices
    return owner[:, 0, :], price[:, 0, :], p, q


def _hardness_hint(p, q, thresh: float = 0.04):
    """Cheap pre-auction difficulty signal: mean NN distance over mean
    pairwise distance, on ~512-point subsamples ([B, 512, 512] planes,
    ~1 ms).

    Auction difficulty is price-war contention — many objects looking
    near-equally good to a person — which scales with how large the
    typical NN distance is relative to the cloud's distance scale.
    Measured on the bench distributions: uniform ~0.012, standard normal
    ~0.02 (both fast at the default budget), correlated model-output
    ~0.055 (68 -> 46 ms with the generous ladder), gaussian-mixture
    ~0.08-0.12 (the round-2 slow case).  An asymmetry-ratio hint was
    tried first and did NOT separate these (bench/probe_r3_emd_auto.py).
    The hint only picks the iteration budget — completion and the
    eps-CS quality bound come from the JV endgame either way, so a miss
    costs time, never correctness."""
    from pytorch_points_tpu.ops.pairwise import pairwise_sqdist

    s = max(1, p.shape[1] // 512)
    ps, qs = p[:, ::s], q[:, ::s]
    d = pairwise_sqdist(ps, qs)
    nn = jnp.mean(jnp.min(d, axis=2), axis=1)  # [B]
    scale_ = jnp.mean(d, axis=(1, 2))
    return jnp.any(nn > thresh * scale_)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "max_iters", "ti", "phases", "scale", "pop_cap",
                     "budgets", "auto_budget", "warm_start"),
)
def auction_assignment(p, q, eps: float, max_iters: int, ti: int = 256,
                       phases: int = 1, scale: float = 6.0,
                       pop_cap: int = 768, budgets: tuple = (),
                       auto_budget: bool = True, warm_start: bool = True):
    """[B,N,3] x2 -> person->object assignment [B,N] int32 (permutation).

    ``phases > 1`` enables eps-scaling (phase k uses eps*scale^(phases-1-k),
    ending at eps) — much faster convergence to the same eps-optimality;
    ``max_iters`` is the per-phase budget.

    ``warm_start`` (default True) initializes object prices by LAPJV-style
    column reduction (price[j] = max_i benefit[i,j], folded for free while
    the benefit cache fills) instead of zeros.  Prices are relative, so
    the eps-CS quality bound is unaffected.  Measured on v5e at N=2048
    (bench/probe_r4_emd_warm{,2}.py): time AND quality improve on normal
    clouds (71.2 -> 63.6 ms, excess 1.78 -> 0.93% mean / 2.94 -> 1.52%
    max at pop 768) and correlated train pairs (46.0 -> 44.9 ms,
    0.220 -> 0.185%); gmm runs 331 -> 218 ms at unchanged ~0.1% excess.
    Warm prices do NOT substitute for eps-scaling: single-phase warm runs
    are 4-5x slower than the 3-phase ladder (probe_r4_emd_warm.py).

    Stragglers left by the per-phase budget are finished by JV shortest
    augmenting paths (_augment_kernel) at the final eps, so the result is
    eps-complementary-slack (cost <= optimal + n*eps) whenever ``pop_cap``
    (Dijkstra scan budget per straggler) doesn't bind — not a greedy
    approximation.  Lower pop_cap trades assignment quality for endgame
    time (warm-started, B=32 N=2048 normal clouds: 768 -> +0.93% mean /
    1.52% max of optimal, 384 -> +2.15%/3.83%;
    bench/probe_r4_emdq3.py).  The endgame cost is data-dependent: spatially correlated
    clouds (e.g. a model's early-training output vs its input) take ~2-3x
    the random-cloud time.  The greedy pass below survives only as a
    termination backstop for the residual round cap."""
    # Integer-only outputs: sever the tangent path (no AD rules needed).
    p = jax.lax.stop_gradient(jnp.asarray(p, jnp.float32))
    q = jax.lax.stop_gradient(jnp.asarray(q, jnp.float32))
    b, n, _ = p.shape
    if auto_budget and not budgets and phases >= 2:
        # Distribution-adaptive phase budgets (measured on v5e,
        # bench/probe_r3_emd_phase.py at N=2048): the default ladder is
        # best on symmetric clouds (random B=32: 54 ms; generous budgets
        # burn +20-30 ms there), the generous ladder on asymmetric ones
        # (correlated B=16: 68.5 -> 46.4 ms, stragglers 179 -> ~40, and
        # BETTER assignments).  One lax.cond picks per call.
        hard_budgets = ((40, 25) + (max_iters,) * phases)[:phases - 1] + (
            max_iters,
        )

        def run(bud):
            return lambda _: _auction_owner(p, q, eps, max_iters, ti,
                                            phases, scale, bud, warm_start)

        owner, price, p, q = jax.lax.cond(
            _hardness_hint(p, q), run(hard_budgets), run(()), None
        )
    else:
        owner, price, p, q = _auction_owner(p, q, eps, max_iters, ti, phases,
                                            scale, budgets, warm_start)
    owner = _residual_rounds(owner, price, p, q, eps, n, pop_cap=pop_cap)
    n_pad = owner.shape[1]
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


@functools.partial(
    jax.jit, static_argnames=("eps", "max_iters", "ti", "phases", "scale")
)
def auction_unassigned_count(p, q, eps: float, max_iters: int, ti: int = 256,
                             phases: int = 1, scale: float = 6.0):
    """Diagnostic: per-batch count of persons the auction left unassigned
    at budget exhaustion (these fall to the greedy completion pass)."""
    p = jax.lax.stop_gradient(jnp.asarray(p, jnp.float32))
    q = jax.lax.stop_gradient(jnp.asarray(q, jnp.float32))
    owner, _, _, _ = _auction_owner(p, q, eps, max_iters, ti, phases, scale)
    return jnp.sum(owner < 0, axis=1)
