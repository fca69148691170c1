"""Probe H: loss-only sorted chamfer, HYBRID form.

probe_r3_lossonly measured the tie_orig=False form: fwd -0.93 ms (no
payload, no un-permute) but fwd+bwd +0.39 ms — the backward's two
perm-composition gathers (take_along_axis(perm, i)) cost more than the
forward saved.  Hybrid: keep tie_orig=True (the id channel rides free
bandwidth; the kernel emits ORIGINAL-space indices directly), skip the
forward un-permute (sums are permutation-invariant), and scatter the
backward straight at the kernel's original-space indices — no
composition gathers at all.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytorch_points_tpu as ppt
from pytorch_points_tpu.kernels import nn_sorted
from pytorch_points_tpu.kernels.nn_sorted import (
    _BUDGET_FRAC,
    _cand_mask,
    _compact_pairs,
    _pad_points_poison,
    _pad_points_poison_neg,
    _round_up,
    _run_resident,
    band_min,
    sort_by_morton,
)
from pytorch_points_tpu.ops.chamfer import _row_gather
from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto
from pytorch_points_tpu.utils.benchmark import measure


def _sums_fwd(p, q, tn=512, tm=64, ft=64, tb=512):
    b, n, _ = p.shape
    m = q.shape[1]
    ps, perm_p = sort_by_morton(p)
    qs, perm_q = sort_by_morton(q)
    align = max(tn, tm, tb)
    n_pad = _round_up(n, align)
    m_pad = _round_up(m, align)
    ps4 = jnp.concatenate([ps, perm_p[..., None].astype(jnp.float32)], -1)
    qs4 = jnp.concatenate([qs, perm_q[..., None].astype(jnp.float32)], -1)
    pp = _pad_points_poison(ps4, n_pad)
    qp = _pad_points_poison_neg(qs4, m_pad)
    d_ub1 = band_min(pp, qp, tb=tb, tbq=128, stride=4)
    d_ub2 = band_min(qp, pp, tb=tb, tbq=128, stride=4)
    cand1 = _cand_mask(pp, qp, d_ub1, ft, tn, tm)
    cand2 = _cand_mask(qp, pp, d_ub2, ft, tn, tm)

    def one_dir(cand, rows, cols):
        ni, nj = cand.shape[1], cand.shape[2]
        k_max = min(ni * nj, int(_BUDGET_FRAC * ni * nj) + ni)
        pairs, count = _compact_pairs(cand, k_max)
        d, i = _run_resident(pairs, jnp.minimum(count, k_max), rows, cols,
                             tn, tm, tie_orig=True)
        return d[:, : rows.shape[1]], i[:, : rows.shape[1]]

    d1, i1o = one_dir(cand1, pp, qp)  # i1o: ORIGINAL q indices
    d2, i2o = one_dir(cand2, qp, pp)
    d1, i1o = d1[:, :n], i1o[:, :n]
    d2, i2o = d2[:, :m], i2o[:, :m]
    s1, s2 = jnp.sum(d1, -1), jnp.sum(d2, -1)
    return (s1, s2), (p, q, ps, qs, i1o, i2o, perm_p, perm_q)


@jax.custom_vjp
def chamfer_sums_h(p, q):
    return _sums_fwd(p, q)[0]


def _sums_bwd(res, g):
    p, q, ps, qs, i1o, i2o, perm_p, perm_q = res
    g1, g2 = g
    # sorted-space rows, ORIGINAL-space NN gather (ids from the kernel)
    diff1 = ps - _row_gather(q, i1o)  # [B,N,3]
    diff2 = qs - _row_gather(p, i2o)  # [B,M,3]
    u1 = 2.0 * g1[:, None, None] * diff1
    u2 = 2.0 * g2[:, None, None] * diff2
    n, m = p.shape[1], q.shape[1]
    gp = scatter_add_auto(jnp.concatenate([perm_p, i2o], 1),
                          jnp.concatenate([u1, -u2], 1), n)
    gq = scatter_add_auto(jnp.concatenate([perm_q, i1o], 1),
                          jnp.concatenate([u2, -u1], 1), m)
    return gp, gq


chamfer_sums_h.defvjp(lambda p, q: _sums_fwd(p, q), _sums_bwd)


def main():
    rng = np.random.default_rng(0)
    B, N = 32, 16384
    p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)) * 0.98 + 0.01, jnp.float32)

    def loss_cur(p):
        # indexed path (the pre-round-4 dispatch) via the public custom_vjp
        d1, _, d2, _ = ppt.nndistance(p, q)
        return jnp.mean(jnp.mean(d1, -1) + jnp.mean(d2, -1))

    def loss_h(p):
        s1, s2 = chamfer_sums_h(p, q)
        return jnp.mean(s1 / p.shape[1] + s2 / q.shape[1])

    lc, gc = jax.jit(jax.value_and_grad(loss_cur))(p)
    lh, gh = jax.jit(jax.value_and_grad(loss_h))(p)
    rel = abs(float(lc - lh)) / abs(float(lc))
    gd = float(jnp.max(jnp.abs(gc - gh)))
    gs = float(jnp.max(jnp.abs(gc)))
    print("loss rel", rel, "grad maxabsdiff", gd, "scale", gs)
    assert rel < 1e-6, f"loss rel diff {rel}"
    assert gd <= 1e-5 * max(gs, 1e-30), f"grad diff {gd} vs {gs}"

    for name, f in (
        ("cur fwd", jax.jit(loss_cur)),
        ("h   fwd", jax.jit(loss_h)),
        ("cur fwd+bwd", jax.jit(jax.value_and_grad(loss_cur))),
        ("h   fwd+bwd", jax.jit(jax.value_and_grad(loss_h))),
    ):
        print(name, round(measure(f, p) * 1e3, 2), "ms")


if __name__ == "__main__":
    main()
