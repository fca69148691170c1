"""Pallas streaming kNN kernels (SURVEY.md §3.1 N4, kernels/topk_scan).

Exact k-nearest-neighbors without materializing the [B, Nq, Ns] distance
matrix (the XLA fallback needs 1-16 GB at DenseEdgeConv scales).

TPU mapping: queries along lanes, support streamed along sublanes (same
tile orientation as chamfer/ball_query).  A per-query top-k buffer
[k, tQ] lives in VMEM scratch.  Per support chunk, candidates are folded
in by *extraction*: a data-dependent while_loop repeatedly takes the
chunk's per-query minimum and replaces the buffer's current worst entry
wherever it improves — after the first few chunks almost nothing improves,
so the loop runs ~1-3 iterations instead of k (the k-th-best bound
tightens monotonically, the classic streaming-selection trick).

Two kernels share that buffer design:

* ``_knn_kernel`` — the original streaming scan in input order.  Handles
  any support layout, including masked clouds whose invalid rows were
  poisoned far away (the poison stretches no bound because there are no
  bounds).  Per chunk it KNOCKS OUT each extracted candidate by rewriting
  the [tM, tQ] distance plane.
* ``_knn_ring_kernel`` — Morton-sorted clouds, support chunks visited in
  ring order around each query tile's Morton-proportional center chunk so
  the k-th-best bound tightens as fast as possible, an AABB lower-bound
  test that skips far chunks outright (same diff^2 bound arithmetic as
  kernels/nn_sorted — matmul-form bounds are UNSOUND, see CLAUDE.md),
  knockout extraction (see ``_ring_chunk``), and a barren-chunk pre-exit.
  Measured at the graded B=16 N=16k k=16 shape on v5e: ring order beat
  the in-order scan 70.6 vs 80.9 ms (round 4, bench/probe_r4_knn4.py;
  larger/smaller chunk sizes and >1x unroll of the THRESHOLD form all
  measured worse), the round-5 knockout extraction beat round 4's
  read-only increasing-threshold emission 58.7 vs 71.4 ms
  (bench/probe_r5_knn_ko.py), and the fused x2 knockout chain
  (``unroll=2`` default) beat single extraction 54.1 vs 58.3 ms
  (bench/probe_r5_knn_ko2.py) — extraction dominates the kernel
  (BASELINE.md roofline), so the per-step plane-pass count is what
  matters; per-column bound tightening does NOT help because both the
  visit test and the trip count reduce over the tile's 512 query
  columns (seeding the buffer with Morton-window neighbors moved
  neither: bench/probe_r5_knn_seed.py, a measured negative).

Tie-breaking matches lax.top_k / the oracle: equal distances resolve to
the lowest support index (verified bitwise vs the dense oracle including
forced duplicate points).  Final ascending (distance, index) sort happens
outside in XLA (k is tiny).
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
# ring kernel sentinels: ids ride an f32 channel, so they must stay exact
# in f32 — 2^24 caps both the sentinel and the supported support size.
_IDX_RING = 2**24
_INF = jnp.inf

# ring dispatch threshold: below this support size the Morton sort +
# un-permute overhead outweighs the AABB-skip/ring-order win.
RING_MIN_NS = 8192


def _knn_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref, topd, topi, dcur_ref,
                *, tm, k_pad):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        topd[:] = jnp.full_like(topd, _INF)
        topi[:] = jnp.zeros_like(topi)

    sup = sup_ref[0]  # [tM, 8]
    qry = qry_ref[0]  # [8, tQ]
    tq = qry.shape[1]
    d = jnp.zeros((tm, tq), jnp.float32)
    for c in range(3):
        diff = sup[:, c : c + 1] - qry[c : c + 1, :]
        d = d + diff * diff
    dcur_ref[:] = d

    im = jax.lax.broadcasted_iota(jnp.int32, (tm, tq), 0) + j * tm
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tq), 0)

    # Extraction loop. The chunk's candidate pool lives in VMEM scratch and
    # the while carry is SCALAR-only (Mosaic hangs on multi-MB tensor
    # carries — learned the hard way).
    def cond(state):
        return state[0]

    def body(state):
        _, it = state
        dcur = dcur_ref[:]
        curmax = jnp.max(topd[:], axis=0, keepdims=True)  # [1, tQ]
        m = jnp.min(dcur, axis=0, keepdims=True)  # [1, tQ]
        a = jnp.min(
            jnp.where(dcur == m, im, _IDX_BIG), axis=0, keepdims=True
        )
        improve = m < curmax  # [1, tQ]
        # Evict the HIGHEST-id row among those tied at curmax — evicting
        # by row position kept the wrong member of an equal-distance pair
        # whenever a tie straddled the k boundary under later-chunk
        # eviction pressure (caught by the ring-kernel cross-check at
        # bench scale, round 4; adjudicated vs a numpy oracle).
        widx = jnp.max(
            jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
            axis=0, keepdims=True,
        )
        rsel = jnp.logical_and(topd[:] == curmax, topi[:] == widx)
        wrow = jnp.min(
            jnp.where(rsel, row_iota, _IDX_BIG), axis=0, keepdims=True
        )
        hot = jnp.logical_and(row_iota == wrow, improve)
        topd[:] = jnp.where(hot, jnp.broadcast_to(m, topd.shape), topd[:])
        topi[:] = jnp.where(hot, jnp.broadcast_to(a, topi.shape), topi[:])
        # knock the extracted candidate out of the chunk
        sel = jnp.logical_and(im == a, improve)
        dcur_ref[:] = jnp.where(sel, _INF, dcur)
        more = jnp.any(
            jnp.min(dcur_ref[:], axis=0)
            < jnp.max(topd[:], axis=0)
        )
        return more, it + 1

    more0 = jnp.any(jnp.min(d, axis=0) < jnp.max(topd[:], axis=0))
    jax.lax.while_loop(cond, body, (more0, jnp.int32(0)))

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[0] = topd[:]
        out_i_ref[0] = topi[:]


def _ring_chunk(sup, qry, topd, topi, dcur_ref, stt, *, tm, k_pad,
                unroll):
    """One support chunk of the ring scan: AABB skip test, distance plane,
    FUSED KNOCKOUT extraction — per while iteration, ``unroll``
    extractions chain through a register-resident plane (each takes the
    plane's per-column min, lowest id on ties, and knocks the extracted
    row out of the in-register copy), then ONE scratch write commits the
    chain and the candidates are inserted into the buffer in extraction
    order.  Round-5 measurements at the graded config-6 shape
    (bench/probe_r5_knn_ko{,2}.py, all bitwise-identical): knockout beat
    the round-4 read-only increasing-threshold emission 58.7 vs 71.4 ms,
    and the fused x2 chain beat the one-extraction loop 54.1 vs 58.3 ms
    (half the while-loop trips, one plane write per trip instead of two;
    x3 is 54.8 — the wasted-extraction cost catches up).

    The knockouts are UNCONDITIONAL (no ``improve`` mask on the plane
    rewrite): per column, the insert verdict is monotone-false over the
    loop — the plane min only increases under knockout, the buffer max
    only decreases, and on curmax-ties the max tied id only decreases —
    so a candidate rejected now is rejected forever and removing it
    loses nothing.  Exhausted columns extract (inf, sentinel), fail the
    insert test, and knock inf rows to inf (idempotent).  For the same
    monotonicity reason the LAST extraction's verdict alone is a correct
    exit test.

    A barren-chunk pre-exit skips the loop when the plane's min cannot
    beat (or tie) the entry bound.  ``stt`` is None in the hot kernel
    (the counters are DCE'd away) and an [8, tQ] f32 scratch in the
    stats twin, accumulating chunk visits at [0, 0] and extraction
    while-loop trips at [1, 0] (x ``unroll`` = emission steps)."""
    tq = qry.shape[1]
    curmax0 = jnp.max(topd[:], axis=0, keepdims=True)  # [1, tQ]

    # AABB lower bound of the whole chunk vs each query; diff^2 arithmetic
    # (construction-consistent with the distance computation below).
    lb = jnp.zeros((1, tq), jnp.float32)
    for c in range(3):
        lo = jnp.min(sup[:, c : c + 1])
        hi = jnp.max(sup[:, c : c + 1])
        g = jnp.maximum(jnp.maximum(lo - qry[c : c + 1, :],
                                    qry[c : c + 1, :] - hi), 0.0)
        lb = lb + g * g
    # strict d >= lb > curmax means not even an equal-distance lower-id
    # candidate can enter the buffer — the whole chunk is skippable.
    visit = jnp.any(lb <= curmax0)

    @pl.when(visit)
    def _():
        d = jnp.zeros((tm, tq), jnp.float32)
        for c in range(3):
            diff = sup[:, c : c + 1] - qry[c : c + 1, :]
            d = d + diff * diff
        dcur_ref[:] = d
        ids = jnp.broadcast_to(sup[:, 3:4], (tm, tq)).astype(jnp.int32)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tq), 0)

        def extract(plane):
            """Per-column plane minimum, lowest id on ties."""
            m = jnp.min(plane, axis=0, keepdims=True)  # [1, tQ]
            a = jnp.min(
                jnp.where(plane == m, ids, jnp.int32(_IDX_RING)),
                axis=0, keepdims=True,
            )
            return m, a

        def insert(m, a):
            """Insert (m, a) wherever it improves the buffer; on
            curmax-ties evict the HIGHEST-id tied row (evicting by row
            position kept the wrong member of an equal-distance pair
            whenever a tie straddled the k boundary under later-chunk
            eviction pressure — caught by the ring/stream cross-check at
            bench scale, round 4)."""
            curmax = jnp.max(topd[:], axis=0, keepdims=True)
            widx = jnp.max(
                jnp.where(topd[:] == curmax, topi[:], jnp.int32(-1)),
                axis=0, keepdims=True,
            )
            improve = jnp.logical_or(
                m < curmax,
                jnp.logical_and(
                    jnp.logical_and(m == curmax, m < _INF), a < widx
                ),
            )
            rsel = jnp.logical_and(topd[:] == curmax, topi[:] == widx)
            wrow = jnp.min(
                jnp.where(rsel, row_iota, jnp.int32(_IDX_RING)),
                axis=0, keepdims=True,
            )
            hot = jnp.logical_and(row_iota == wrow, improve)
            topd[:] = jnp.where(hot, jnp.broadcast_to(m, topd.shape),
                                topd[:])
            topi[:] = jnp.where(hot, jnp.broadcast_to(a, topi.shape),
                                topi[:])
            return improve

        def cond(state):
            return state[0]

        def body(state):
            _, it = state
            plane = dcur_ref[:]
            cands = []
            for _u in range(unroll):
                m, a = extract(plane)
                plane = jnp.where(
                    ids == jnp.broadcast_to(a, ids.shape), _INF, plane)
                cands.append((m, a))
            dcur_ref[:] = plane
            for m, a in cands:
                more = insert(m, a)
            return jnp.any(more), it + 1

        # barren-chunk pre-exit: if the plane min cannot beat OR TIE the
        # entry bound anywhere, no candidate can insert (the bound only
        # shrinks) — skip the ~7-plane-pass first step outright.
        enter = jnp.any(jnp.min(d, axis=0) <= curmax0[0])
        final = jax.lax.while_loop(cond, body, (enter, jnp.int32(0)))
        if stt is not None:
            r = jax.lax.broadcasted_iota(jnp.int32, stt.shape, 0)
            c = jax.lax.broadcasted_iota(jnp.int32, stt.shape, 1)
            at0 = jnp.logical_and(r == 0, c == 0)
            at1 = jnp.logical_and(r == 1, c == 0)
            stt[:] = (stt[:] + jnp.where(at0, 1.0, 0.0)
                      + jnp.where(at1, final[1].astype(jnp.float32), 0.0))


def _knn_ring_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref,
                     topd, topi, dcur_ref, *, tm, k_pad, unroll):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        topd[:] = jnp.full_like(topd, _INF)
        topi[:] = jnp.full_like(topi, jnp.int32(_IDX_RING))

    _ring_chunk(sup_ref[0], qry_ref[0], topd, topi, dcur_ref, None,
                tm=tm, k_pad=k_pad, unroll=unroll)

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[0] = topd[:]
        out_i_ref[0] = topi[:]


def _knn_ring_stats_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref, out_s_ref,
                           topd, topi, dcur_ref, stt,
                           *, tm, k_pad, unroll):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        topd[:] = jnp.full_like(topd, _INF)
        topi[:] = jnp.full_like(topi, jnp.int32(_IDX_RING))
        stt[:] = jnp.zeros_like(stt)

    _ring_chunk(sup_ref[0], qry_ref[0], topd, topi, dcur_ref, stt,
                tm=tm, k_pad=k_pad, unroll=unroll)

    @pl.when(j == nj - 1)
    def _():
        out_d_ref[0] = topd[:]
        out_i_ref[0] = topi[:]
        out_s_ref[0] = stt[:]


def _knn_ring_kernel_pf(cent_ref, qry_ref, sup_ref, out_d_ref, out_i_ref,
                        topd, topi, dcur_ref, *, tm, k_pad, unroll):
    del cent_ref  # consumed by the index maps only
    _knn_ring_kernel(qry_ref, sup_ref, out_d_ref, out_i_ref,
                     topd, topi, dcur_ref,
                     tm=tm, k_pad=k_pad, unroll=unroll)


def _round_up(v, m):
    return -(-v // m) * m


def _pad_points_poison(x, target_n, sign=1.0):
    b, n, c = x.shape
    if n == target_n:
        return x
    pad = target_n - n
    offs = sign * (BIG_COORD * 4.0 + 8.0 * jnp.arange(pad, dtype=x.dtype))
    poison = jnp.zeros((b, pad, c), x.dtype).at[:, :, 0].set(offs[None, :])
    return jnp.concatenate([x, poison], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "unroll"))
def knn_ring(query, support, k: int, tq: int = 512, tm: int = 512,
             unroll: int = 2):
    """Morton-ring kNN: [B,Nq,3], [B,Ns,3] -> (dist [B,Nq,k], idx int32).

    Bitwise-identical output to ``knn`` (ascending squared distance,
    lowest-index ties) — both clouds are Morton-sorted, support chunks are
    visited in ring order around each query tile's center with an AABB
    skip, and query rows are un-permuted at the end.  Requires clean
    coordinates (no poison padding: a masked cloud's poison rows would
    stretch the Morton AABB until pruning dies) and Ns < 2^24.
    """
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    if k > ns:
        raise ValueError(f"k={k} > support size {ns}")
    if ns >= _IDX_RING:
        raise ValueError(f"knn_ring requires Ns < 2^24, got {ns}")
    k_pad = _round_up(k, 8)

    from pytorch_points_tpu.kernels import nn_sorted

    ss, perm_s = nn_sorted.sort_by_morton(support)
    qs, perm_q = nn_sorted.sort_by_morton(query)

    q_pad = _round_up(nq, tq)
    m_pad = _round_up(ns, tm)
    qsp = jnp.pad(qs, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    # pad support with far-away poison + huge ids (never win, never tie)
    padm = m_pad - ns
    sup4 = jnp.concatenate(
        [ss, perm_s[..., None].astype(jnp.float32)], axis=-1
    )  # [B, Ns, 4]: coords + original index
    if padm:
        offs = -(BIG_COORD * 4.0 + 8.0 * jnp.arange(padm, dtype=jnp.float32))
        pad = jnp.zeros((b, padm, 4), jnp.float32)
        pad = pad.at[:, :, 0].set(offs[None, :])
        pad = pad.at[:, :, 3].set(float(_IDX_RING))
        sup4 = jnp.concatenate([sup4, pad], axis=1)

    qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4)))

    ni, nj = q_pad // tq, m_pad // tm

    def sup_index(bi, i, j):
        # ring order: chunk 0 is the query tile's Morton-proportional
        # center, then alternating outward (+1, -1, +2, ...) mod nj.
        center = ((i * tq + tq // 2) * nj) // q_pad
        off = ((j + 1) // 2) * (2 * (j % 2) - 1)
        return (bi, jax.lax.rem(center + off + nj, nj), 0)

    grid = (b, ni, nj)
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_ring_kernel, tm=tm, k_pad=k_pad,
                          unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), sup_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),   # chunk distance plane
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * b * q_pad * m_pad,
            bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad + 2 * k_pad * q_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(qry_t, sup_s)

    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))  # sorted-query order
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    # un-permute query rows back to original order
    inv = jnp.zeros_like(perm_q).at[
        jnp.arange(b)[:, None], perm_q
    ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
    d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
    i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
    return d_out[..., :k], i_out[..., :k]


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "unroll"))
def _knn_ring_stats_call(query, support, k: int, tq: int = 512, tm: int = 512,
                         unroll: int = 2):
    """Telemetry twin of :func:`knn_ring` (same algorithm + counters):
    returns (d, i, stats [B, nI, 2]) where stats[..., 0] = support chunks
    VISITED by that query tile (of nJ total) and stats[..., 1] = extraction
    while-loop trips (x ``unroll`` = emission steps).  Bench-only cost —
    the counter accumulation adds ~2 plane ops per visited chunk."""
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    k_pad = _round_up(k, 8)

    from pytorch_points_tpu.kernels import nn_sorted

    ss, perm_s = nn_sorted.sort_by_morton(support)
    qs, perm_q = nn_sorted.sort_by_morton(query)

    q_pad = _round_up(nq, tq)
    m_pad = _round_up(ns, tm)
    qsp = jnp.pad(qs, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    padm = m_pad - ns
    sup4 = jnp.concatenate(
        [ss, perm_s[..., None].astype(jnp.float32)], axis=-1
    )
    if padm:
        offs = -(BIG_COORD * 4.0 + 8.0 * jnp.arange(padm, dtype=jnp.float32))
        pad = jnp.zeros((b, padm, 4), jnp.float32)
        pad = pad.at[:, :, 0].set(offs[None, :])
        pad = pad.at[:, :, 3].set(float(_IDX_RING))
        sup4 = jnp.concatenate([sup4, pad], axis=1)

    qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4)))

    ni, nj = q_pad // tq, m_pad // tm

    def sup_index(bi, i, j):
        center = ((i * tq + tq // 2) * nj) // q_pad
        off = ((j + 1) // 2) * (2 * (j % 2) - 1)
        return (bi, jax.lax.rem(center + off + nj, nj), 0)

    grid = (b, ni, nj)
    out_d, out_i, out_s = pl.pallas_call(
        functools.partial(_knn_ring_stats_kernel, tm=tm, k_pad=k_pad,
                          unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), sup_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, q_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),
            pltpu.VMEM((8, tq), jnp.float32),   # stats counters
        ],
        interpret=interpret_mode(),
    )(qry_t, sup_s)

    # counters live at column 0 of each tile's [8, tQ] stats plane
    stats = jnp.stack(
        [out_s[:, 0, ::tq], out_s[:, 1, ::tq]], axis=-1
    )  # [B, nI, 2]: (visits, while trips)
    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    inv = jnp.zeros_like(perm_q).at[
        jnp.arange(b)[:, None], perm_q
    ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
    d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
    i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
    return d_out[..., :k], i_out[..., :k], stats


def knn_ring_stats(query, support, k: int, tq: int = 512, tm: int = 512,
                   unroll: int = 2):
    """Roofline telemetry for the ring kNN kernel (round-4 verdict item 3):
    runs the stats twin and aggregates — visit_rate (fraction of
    (query-tile, chunk) pairs scanned after the AABB skip) and
    extraction trips per visited chunk.  Results verified identical to
    :func:`knn_ring`; bench/probe use only."""
    import numpy as np

    d, i, stats = _knn_ring_stats_call(query, support, k, tq=tq, tm=tm,
                                       unroll=unroll)
    s = np.asarray(stats, np.float64)  # [B, nI, 2]
    ns = support.shape[1]
    nj = _round_up(ns, tm) // tm
    visits = float(s[..., 0].sum())
    trips = float(s[..., 1].sum())
    tiles = float(s.shape[0] * s.shape[1])
    return d, i, {
        "visit_rate": visits / (tiles * nj),
        "visits_per_tile": visits / tiles,
        "chunks": nj,
        "trips_per_visit": trips / max(visits, 1.0),
        "steps_per_visit": trips * unroll / max(visits, 1.0),
    }


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "unroll"))
def knn_ring_masked(query, support, k: int, tq: int = 512, tm: int = 512,
                    unroll: int = 2):
    """Morton-ring kNN for POISONED support clouds
    (``core.masking.poison_points`` applied by the wrapper; validity is
    derived from the poison coordinate, |x0| < BIG_COORD — the
    library-wide normalized-cloud envelope, same contract as
    ``nn_sorted.nndistance_indexed_masked``).

    Closes the round-4 gap where masked supports always paid the in-order
    streaming scan: raw poison coordinates must not enter a Morton AABB
    (they collapse every valid point into one cell), so this variant ports
    the masked machinery from kernels/nn_sorted — valid points Morton-sort
    over the VALID AABB with poison rows forced last
    (``sort_by_morton_masked``), and each query tile's ring center is
    scaled into the support's VALID chunk range through a scalar-prefetched
    center table (the analog of the masked chamfer's dynamic band
    centers).  Poison-only trailing chunks have far-away AABBs, so the
    in-kernel lower-bound test skips them outright; the one mixed
    valid/poison boundary chunk is scanned normally (poison rows lose
    every distance comparison).  Queries are assumed clean — a poisoned
    QUERY row only degrades its own ring-center heuristic, never
    correctness, since the AABB skip is sound for any query coordinate.

    Output is bitwise-identical to the streaming kernel on the same
    poisoned cloud (ascending squared distance, lowest-index ties).
    """
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    if k > ns:
        raise ValueError(f"k={k} > support size {ns}")
    if ns >= _IDX_RING:
        raise ValueError(f"knn_ring_masked requires Ns < 2^24, got {ns}")
    k_pad = _round_up(k, 8)

    from pytorch_points_tpu.kernels import nn_sorted

    valid = jnp.abs(support[..., 0]) < BIG_COORD
    ss, perm_s, _ = nn_sorted.sort_by_morton_masked(support, valid)
    qs, perm_q = nn_sorted.sort_by_morton(query)

    q_pad = _round_up(nq, tq)
    m_pad = _round_up(ns, tm)
    qsp = jnp.pad(qs, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    padm = m_pad - ns
    sup4 = jnp.concatenate(
        [ss, perm_s[..., None].astype(jnp.float32)], axis=-1
    )  # [B, Ns, 4]: coords + original index
    if padm:
        # pad offsets shifted past ns so they can never bitwise-tie a
        # wrapper-poisoned row (poison_points uses BIG + 4*i, i < ns)
        offs = -(BIG_COORD * 4.0
                 + 8.0 * (ns + jnp.arange(padm, dtype=jnp.float32)))
        pad = jnp.zeros((b, padm, 4), jnp.float32)
        pad = pad.at[:, :, 0].set(offs[None, :])
        pad = pad.at[:, :, 3].set(float(_IDX_RING))
        sup4 = jnp.concatenate([sup4, pad], axis=1)

    qry_t = jnp.transpose(jnp.pad(qsp, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup4, ((0, 0), (0, 0), (0, 4)))

    ni, nj = q_pad // tq, m_pad // tm

    # Ring centers: query tile i's Morton-proportional rank, scaled into
    # the support's VALID chunk count (valid rows occupy the first
    # ceil(vq/tm) chunks after the poison-last sort).
    vq = jnp.sum(valid, axis=1).astype(jnp.int32)  # [B]
    nvc = jnp.maximum((vq + tm - 1) // tm, 1)  # valid chunk count >= 1
    i_arr = jnp.arange(ni, dtype=jnp.int32)
    centers = jnp.clip(
        ((i_arr[None, :] * tq + tq // 2) * nvc[:, None]) // q_pad,
        0, nj - 1,
    ).astype(jnp.int32)  # [B, nI]

    def sup_index(bi, i, j, cent):
        off = ((j + 1) // 2) * (2 * (j % 2) - 1)
        return (bi, jax.lax.rem(cent[bi, i] + off + nj, nj), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda bi, i, j, cent: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), sup_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j, cent: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j, cent: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),   # chunk distance plane
        ],
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_ring_kernel_pf, tm=tm, k_pad=k_pad,
                          unroll=unroll),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * b * q_pad * m_pad,
            bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad + 2 * k_pad * q_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(centers, qry_t, sup_s)

    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))  # sorted-query order
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    inv = jnp.zeros_like(perm_q).at[
        jnp.arange(b)[:, None], perm_q
    ].set(jnp.broadcast_to(jnp.arange(nq)[None, :], (b, nq)))
    d_out = jnp.take_along_axis(d_sorted, inv[..., None], axis=1)
    i_out = jnp.take_along_axis(i_sorted, inv[..., None], axis=1)
    return d_out[..., :k], i_out[..., :k]


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "tm", "sorted_ok", "masked"))
def knn(query, support, k: int, tq: int | None = None, tm: int | None = None,
        sorted_ok: bool = True, masked: bool = False):
    """[B,Nq,3], [B,Ns,3] -> (dist [B,Nq,k] squared ascending, idx int32).

    Exact, sorted, lowest-index ties — identical to the XLA lax.top_k path.
    Large supports dispatch to the Morton-ring kernel (``knn_ring``;
    ``knn_ring_masked`` when ``masked=True`` marks the support as carrying
    poison rows from ``core.masking.poison_points``, whose raw coordinates
    must not enter a Morton AABB).  ``sorted_ok=False`` forces the in-order
    streaming scan (the cross-check oracle for both ring kernels).
    """
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    if k > ns:
        raise ValueError(f"k={k} > support size {ns}")
    if (sorted_ok and tq is None and tm is None
            and ns >= RING_MIN_NS and ns < _IDX_RING):
        if masked:
            return knn_ring_masked(query, support, k)
        return knn_ring(query, support, k)
    k_pad = _round_up(k, 8)

    if tq is None:
        tq = min(512, _round_up(nq, 128))
    if tm is None:
        tm = min(512, _round_up(ns, 8))
    q_pad = _round_up(nq, tq)
    m_pad = _round_up(ns, tm)

    qry = jnp.pad(query, ((0, 0), (0, q_pad - nq), (0, 0)), mode="edge")
    sup = _pad_points_poison(support, m_pad, sign=-1.0)

    qry_t = jnp.transpose(jnp.pad(qry, ((0, 0), (0, 0), (0, 5))), (0, 2, 1))
    sup_s = jnp.pad(sup, ((0, 0), (0, 0), (0, 5)))

    grid = (b, q_pad // tq, m_pad // tm)
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, tm=tm, k_pad=k_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 8), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, tq), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, q_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, tq), jnp.float32),
            pltpu.VMEM((k_pad, tq), jnp.int32),
            pltpu.VMEM((tm, tq), jnp.float32),  # chunk candidate pool
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * b * q_pad * m_pad,
            bytes_accessed=4 * b * (8 * q_pad + 8 * m_pad + 2 * k_pad * q_pad),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(qry_t, sup_s)

    d = jnp.transpose(out_d[:, :, :nq], (0, 2, 1))[:, :, :k_pad]  # [B,Nq,k_pad]
    i = jnp.transpose(out_i[:, :, :nq], (0, 2, 1))
    # ascending (distance, index) sort; then trim padding rows
    d_sorted, i_sorted = jax.lax.sort((d, i), dimension=2, num_keys=2)
    return d_sorted[..., :k], i_sorted[..., :k]
