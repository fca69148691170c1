"""Pallas streaming kNN kernel (SURVEY.md §3.1 N4, kernels/topk_scan).

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

Tie-breaking matches lax.top_k / the oracle: equal distances resolve to
the lowest support index (earlier chunks extract first; strict-< insert
refuses equal-distance latecomers).  Final ascending (distance, index)
sort happens outside in XLA (k is tiny).
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
_INF = jnp.inf


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
        # replace the (first) worst buffer row where improving
        rsel = topd[:] == curmax
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


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm"))
def knn(query, support, k: int, tq: int | None = None, tm: int | None = None):
    """[B,Nq,3], [B,Ns,3] -> (dist [B,Nq,k] squared ascending, idx int32).

    Exact, sorted, lowest-index ties — identical to the XLA lax.top_k path.
    """
    query = jnp.asarray(query, jnp.float32)
    support = jnp.asarray(support, jnp.float32)
    b, nq, _ = query.shape
    ns = support.shape[1]
    if k > ns:
        raise ValueError(f"k={k} > support size {ns}")
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
