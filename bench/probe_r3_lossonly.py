"""Probe: loss-only sorted-space chamfer (tie_orig=False, no un-permute)
vs the indexed path, at the graded headline shape B=32 N=16k.

ROADMAP round-4 candidate 1: the round-2 "loss-only measured equal" note
predates the 4x-unrolled resident kernel + lane-aligned cand mask, so the
relative weight of the tie payload + un-permute scatters has grown.

OUTCOME (2026-08-19, v5e): this tie_orig=False form LOSES net — fwd
-0.93 ms but fwd+bwd +0.39 ms: the backward's two take_along_axis
perm-composition gathers cost more than the dropped payload saves.
CAVEAT: by the time this ran, ops/chamfer.py already dispatched
chamfer_distance to a loss-only path, so "cur" here is NOT the indexed
baseline — see bench/probe_r4_lossonly_h.py for the clean comparison
(indexed 23.26 ms fwd+bwd vs hybrid 22.71).  The hybrid (tie_orig=True,
no un-permute, direct original-space scatters) is what shipped.
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
from pytorch_points_tpu.ops.chamfer import _row_gather
from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto
from pytorch_points_tpu.utils.benchmark import measure


def _sums_fwd(p, q):
    ps, perm_p = nn_sorted.sort_by_morton(p)
    qs, perm_q = nn_sorted.sort_by_morton(q)
    d1, i1, d2, i2 = nn_sorted.nndistance_presorted(ps, qs)
    return (jnp.sum(d1, -1), jnp.sum(d2, -1)), (ps, qs, i1, i2, perm_p, perm_q)


@jax.custom_vjp
def chamfer_sums_sorted(p, q):
    return _sums_fwd(p, q)[0]


def _sums_bwd(res, g):
    ps, qs, i1, i2, perm_p, perm_q = res
    g1, g2 = g
    diff1 = ps - _row_gather(qs, i1)  # [B,N,3] sorted space
    diff2 = qs - _row_gather(ps, i2)  # [B,M,3]
    u1 = 2.0 * g1[:, None, None] * diff1
    u2 = 2.0 * g2[:, None, None] * diff2
    # compose the un-permute INTO the backward scatters: original-index
    # targets are perm rows (direct term) / perm gathered at the NN index
    # (cross term); one concatenated scatter per cloud.
    pq_i1 = jnp.take_along_axis(perm_q, i1, axis=1)
    pp_i2 = jnp.take_along_axis(perm_p, i2, axis=1)
    n, m = ps.shape[1], qs.shape[1]
    gp = scatter_add_auto(jnp.concatenate([perm_p, pp_i2], 1),
                          jnp.concatenate([u1, -u2], 1), n)
    gq = scatter_add_auto(jnp.concatenate([perm_q, pq_i1], 1),
                          jnp.concatenate([u2, -u1], 1), m)
    return gp, gq


chamfer_sums_sorted.defvjp(lambda p, q: _sums_fwd(p, q), _sums_bwd)


def main():
    rng = np.random.default_rng(0)
    B, N = 32, 16384
    p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)) * 0.98 + 0.01, jnp.float32)

    def loss_cur(p):
        return ppt.chamfer_distance(p, q)

    def loss_new(p):
        s1, s2 = chamfer_sums_sorted(p, q)
        # per-cloud sizes (shape-general: mean = s1/N + s2/M, advisor r3)
        return jnp.mean(s1 / p.shape[1] + s2 / q.shape[1])

    lc, gc = jax.jit(jax.value_and_grad(loss_cur))(p)
    ln, gn = jax.jit(jax.value_and_grad(loss_new))(p)
    rel = abs(float(lc - ln)) / abs(float(lc))
    print("loss cur/new", float(lc), float(ln), "rel", rel)
    gd = float(jnp.max(jnp.abs(gc - gn)))
    gs = float(jnp.max(jnp.abs(gc)))
    print("grad maxabsdiff", gd, "scale", gs)
    # fail loudly on numerical divergence (advisor r3): sum-order may move
    # the loss in low bits; grads must agree up to tie-equivalent scatters.
    assert rel < 1e-6, f"loss rel diff {rel} too large"
    assert gd <= 1e-5 * max(gs, 1e-30), f"grad diff {gd} vs scale {gs}"

    for name, f in (
        ("cur fwd", jax.jit(loss_cur)),
        ("new fwd", jax.jit(loss_new)),
        ("cur fwd+bwd", jax.jit(jax.value_and_grad(loss_cur))),
        ("new fwd+bwd", jax.jit(jax.value_and_grad(loss_new))),
    ):
        print(name, round(measure(f, p) * 1e3, 2), "ms")


if __name__ == "__main__":
    main()
