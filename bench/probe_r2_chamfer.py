"""Round-2 probe: where does the pruned-chamfer time go? (run on TPU)"""
import os, functools

import jax, numpy as np
import jax.numpy as jnp

cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pytorch_points_tpu.kernels import distance_tiles as dt
from pytorch_points_tpu.utils.benchmark import measure

rng = np.random.default_rng(0)
B, N, M = 32, 16384, 16384
p = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)), jnp.float32)

report = {}

# 1. dense fused kernel (current default)
t = measure(jax.jit(dt.nn_both_directions), p, q, iters=5)
report["dense_fused_ms"] = t * 1e3

# 2. morton + argsort + gather-both-clouds (the sort pipeline, argsort form)
@jax.jit
def sort_pipeline(p, q):
    perm_p = jnp.argsort(dt._morton_codes(p), axis=1).astype(jnp.int32)
    perm_q = jnp.argsort(dt._morton_codes(q), axis=1).astype(jnp.int32)
    ps = jnp.take_along_axis(p, perm_p[..., None], axis=1)
    qs = jnp.take_along_axis(q, perm_q[..., None], axis=1)
    return perm_p, perm_q, ps, qs

t = measure(sort_pipeline, p, q, iters=5)
report["sort_argsort_gather_ms"] = t * 1e3

# 2b. variadic lax.sort carrying coords as payload (no separate gather)
@jax.jit
def sort_variadic(p, q):
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    outs = []
    for x in (p, q):
        code = dt._morton_codes(x)
        _, pm, x0, x1, x2 = jax.lax.sort(
            (code, iota, x[..., 0], x[..., 1], x[..., 2]),
            dimension=1, num_keys=1)
        outs.append((pm, jnp.stack([x0, x1, x2], axis=-1)))
    return outs

t = measure(sort_variadic, p, q, iters=5)
report["sort_variadic_ms"] = t * 1e3

# 2c. just the argsorts (no gathers)
@jax.jit
def sorts_only(p, q):
    return (jnp.argsort(dt._morton_codes(p), axis=1),
            jnp.argsort(dt._morton_codes(q), axis=1))

t = measure(sorts_only, p, q, iters=5)
report["argsorts_only_ms"] = t * 1e3

# 3. full pruned path (current, opt-in)
t = measure(jax.jit(dt.nn_both_directions_pruned), p, q, iters=5)
report["pruned_worklist_full_ms"] = t * 1e3

# 4. prologue of the pruned path: sort + bounds + candidate mask + worklist
#    compaction, but no kernel.
def prologue(p, q, tn=1024, tm=256):
    b, n, _ = p.shape
    m = q.shape[1]
    n_pad = dt._round_up(n, tn)
    m_pad = dt._round_up(m, tm)
    ni, nj = n_pad // tn, m_pad // tm
    perm_p = jnp.argsort(dt._morton_codes(p), axis=1).astype(jnp.int32)
    perm_q = jnp.argsort(dt._morton_codes(q), axis=1).astype(jnp.int32)
    ps = jnp.take_along_axis(p, perm_p[..., None], axis=1)
    qs_sorted = jnp.take_along_axis(q, perm_q[..., None], axis=1)
    pp = dt._pad_points_poison(ps, n_pad)
    qp = dt._pad_points_poison_neg(qs_sorted, m_pad)
    plo, phi = dt._tile_bounds(pp, tn)
    qlo, qhi = dt._tile_bounds(qp, tm)
    gap = jnp.maximum(
        jnp.maximum(qlo[:, None, :, :] - phi[:, :, None, :],
                    plo[:, :, None, :] - qhi[:, None, :, :]), 0.0)
    lb = jnp.sum(gap * gap, axis=-1)
    jal = jnp.arange(n) * m // n
    d_al1 = jnp.sum((ps - qs_sorted[:, jal, :]) ** 2, axis=-1)
    d_al1 = jnp.pad(d_al1, ((0, 0), (0, n_pad - n)), constant_values=jnp.inf)
    ub1 = jnp.max(d_al1.reshape(b, ni, tn), axis=-1)
    ial = jnp.arange(m) * n // m
    d_al2 = jnp.sum((qs_sorted - ps[:, ial, :]) ** 2, axis=-1)
    d_al2 = jnp.pad(d_al2, ((0, 0), (0, m_pad - m)), constant_values=jnp.inf)
    ub2 = jnp.max(d_al2.reshape(b, nj, tm), axis=-1)
    safe = 1.0 + 1e-5
    cand = jnp.logical_or(
        lb <= ub1[:, :, None] * safe, lb <= ub2[:, None, :] * safe
    ).astype(jnp.int32)
    flat = cand.reshape(b, ni * nj)
    order = jnp.argsort(1 - flat, axis=1, stable=True)
    count = jnp.sum(flat, axis=1)
    return order, count, pp, qp

t = measure(jax.jit(prologue), p, q, iters=5)
report["pruned_prologue_ms"] = t * 1e3

# 5. candidate fraction at a few tile sizes (how much is prunable)
for tn, tm in ((1024, 256), (512, 256), (512, 512), (256, 256)):
    f = jax.jit(functools.partial(prologue, tn=tn, tm=tm))
    order, count, _, _ = f(p, q)
    n_pad = dt._round_up(N, tn); m_pad = dt._round_up(M, tm)
    ni, nj = n_pad // tn, m_pad // tm
    frac = float(jnp.mean(count / (ni * nj)))
    report[f"cand_frac_tn{tn}_tm{tm}"] = round(frac, 4)

# 6. un-permute epilogue cost (6 narrow gathers as in from_work)
@jax.jit
def epilogue(perm_p, perm_q, d1s, i1s, d2s, i2s):
    inv_p = jnp.argsort(perm_p, axis=1)
    inv_q = jnp.argsort(perm_q, axis=1)
    i1 = jnp.take_along_axis(jnp.take_along_axis(perm_q, i1s, axis=1), inv_p, axis=1)
    d1 = jnp.take_along_axis(d1s, inv_p, axis=1)
    i2 = jnp.take_along_axis(jnp.take_along_axis(perm_p, i2s, axis=1), inv_q, axis=1)
    d2 = jnp.take_along_axis(d2s, inv_q, axis=1)
    return d1, i1, d2, i2

perm = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
d1s = jnp.zeros((B, N)); i1s = perm
t = measure(epilogue, perm, perm, d1s, i1s, d1s, i1s, iters=5)
report["unpermute_epilogue_ms"] = t * 1e3

for k, v in report.items():
    print(f"{k:36s} {v:10.3f}" if isinstance(v, float) else f"{k:36s} {v}")
