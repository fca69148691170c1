"""Furthest point sampling + gather.

Reference semantics (SURVEY.md §4.2, BASELINE.json:8): iteratively select
``k`` points maximizing the minimum distance to the already-selected set,
seeded with index 0, tie-break = lowest index.  The selection must be
index-identical to the reference (BASELINE.json:5), so all distance math is
float32 and ties resolve via first-occurrence argmax.

TPU-native design: the k-step loop is inherently serial; it runs as a
single jitted ``lax.fori_loop`` (one compiled region — never k dispatches,
mirroring the reference's single-kernel loop), with the per-step O(N)
min-distance update + argmax on the VPU.  The Pallas variant
(kernels/fps.py) keeps coordinates and the running min-distance resident in
VMEM across all k steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pytorch_points_tpu.kernels import dispatch


def _fps_xla(xyz, k, mask, seed_idx=None):
    """Pure-XLA FPS. xyz [B,N,3] f32, mask [B,N] bool or None -> idx [B,k] i32."""
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones((b, n), dtype=bool)
    # Invalid points can never be selected: their running min-dist is -inf.
    neg = jnp.float32(-jnp.inf)
    init_mind = jnp.where(mask, jnp.float32(1e10), neg)

    # First selected index: first valid point (index 0 when unmasked),
    # or the caller-forced seed.
    if seed_idx is None:
        first = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    else:
        first = jnp.asarray(seed_idx, jnp.int32)

    def body(i, state):
        mind, last, out = state
        last_xyz = jnp.take_along_axis(
            xyz, last[:, None, None], axis=1
        )  # [B,1,3]
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # [B,N]
        mind = jnp.minimum(mind, jnp.where(mask, d, neg))
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return mind, nxt, out

    out0 = jnp.zeros((b, k), dtype=jnp.int32).at[:, 0].set(first)
    _, _, out = jax.lax.fori_loop(1, k, body, (init_mind, first, out0))
    return out


@functools.partial(jax.jit, static_argnames=("k", "impl"))
def furthest_point_sample(xyz, k: int, mask=None, impl: str = "auto",
                          seed_idx=None):
    """Select ``k`` furthest-point-sampled indices from each cloud.

    Args:
      xyz: [B, N, 3] float coordinates.
      k: number of points to select (static).
      mask: optional [B, N] bool validity mask.  Invalid points are never
        selected.  If a cloud has fewer than ``k`` valid points the sampler
        re-selects the point most distant from the selected set (which will
        be a duplicate) — callers should bucket so k <= num_valid.
      impl: "auto" | "pallas" | "xla".
      seed_idx: optional [B] int32 — force the FIRST selection per cloud
        (default: lowest valid index, the reference seeding).  Used by
        the Morton-consistent pipeline to select the same FPS set on a
        permuted cloud.
    """
    xyz = jnp.asarray(xyz)
    if xyz.ndim != 3:
        raise ValueError(f"expected [B,N,3], got {xyz.shape}")
    resolved = dispatch.resolve(impl, "fps")
    with jax.named_scope("ppt.fps"):
        if resolved == "pallas":
            from pytorch_points_tpu.kernels import fps as fps_kernel

            return fps_kernel.furthest_point_sample(xyz, k, mask,
                                                    seed_idx=seed_idx)
        return _fps_xla(xyz, k, mask, seed_idx=seed_idx)


def _gather_forward(features, idx):
    # features [B,N,C], idx [B,K] -> [B,K,C]
    out = _maybe_pallas_gather(features, idx)
    if out is not None:
        return out
    return jnp.take_along_axis(features, idx[..., None], axis=1)

def _maybe_pallas_gather(features, idx_flat):
    """MXU gather when it beats XLA's row fetches: many rows, NARROW
    features.  XLA's gather is latency-bound (~7.5 ns/row) for thin rows
    but bandwidth-bound (fast) for wide ones; the bilinear contraction
    costs ~6*K*N*C bf16 flops.  Measured crossover: C=3 -> 2.1x win,
    C=128 -> XLA 2.4x faster."""
    from pytorch_points_tpu.kernels import dispatch

    if (
        dispatch.resolve("auto", "gather") == "pallas"
        and idx_flat.shape[1] >= 4096
        and features.shape[2] <= 16
        and features.shape[1] * features.shape[2] <= 524288
        and features.dtype == jnp.float32
    ):
        from pytorch_points_tpu.kernels.gather import gather_rows_t

        # transposed-layout h-select kernel: rows stay on the lane axis
        # end to end (3.5 ms / 2.1M rows C=3, was 10.1 -> 5.3 -> 3.5;
        # bench/probe_r4_gather.py)
        return gather_rows_t(features, idx_flat)
    return None



@jax.custom_vjp
def _gather(features, idx):
    return _gather_forward(features, idx)


def _gather_fwd(features, idx):
    return _gather_forward(features, idx), (idx, features.shape)


def _gather_bwd(res, g):
    idx, shape = res
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    return scatter_add_auto(idx, g, shape[1]), None


_gather.defvjp(_gather_fwd, _gather_bwd)


def gather_points(features, idx):
    """Gather feature rows at the given indices.

    Args:
      features: [B, N, C] (channels-last; see compat module for the
        reference's [B, C, N] layout).
      idx: [B, K] int32 indices.

    Returns:
      [B, K, C]; backward is a deterministic scatter-add into the N axis
      (reference: gather_points_kernel + atomicAdd grad, SURVEY.md §3.1 N3).
    """
    features = jnp.asarray(features)
    idx = jnp.asarray(idx).astype(jnp.int32)
    return _gather(features, idx)


@jax.custom_vjp
def _gather_emitted(xyz, idx, emitted):
    # Forward value = the kernel-emitted coordinates (bitwise equal to
    # gather_points(xyz, idx)); backward = the gather's scatter-add, so
    # xyz stays differentiable even though the kernel stop-gradients it.
    return emitted


def _gather_emitted_fwd(xyz, idx, emitted):
    return emitted, (idx, xyz.shape[1])


def _gather_emitted_bwd(res, g):
    idx, n = res
    from pytorch_points_tpu.ops.scatter_impl import scatter_add_auto

    return scatter_add_auto(idx, g, n), None, jnp.zeros_like(g)


_gather_emitted.defvjp(_gather_emitted_fwd, _gather_emitted_bwd)


def furthest_point_sample_and_gather(xyz, k: int, mask=None,
                                     impl: str = "auto", seed_idx=None):
    """FPS then gather the sampled coordinates: returns (new_xyz [B,k,3], idx).

    On the Pallas path the kernel emits the selected coordinates directly
    (it extracts them every step anyway), so the centroid gather's forward
    is free; the backward is the usual scatter-add into xyz."""
    xyz = jnp.asarray(xyz)
    if dispatch.resolve(impl, "fps") == "pallas":
        from pytorch_points_tpu.kernels import fps as fps_kernel

        with jax.named_scope("ppt.fps"):
            idx, coords = fps_kernel.furthest_point_sample(
                xyz, k, mask, seed_idx=seed_idx, emit_coords=True
            )
        return _gather_emitted(xyz, idx, coords), idx
    idx = furthest_point_sample(xyz, k, mask=mask, impl=impl,
                                seed_idx=seed_idx)
    return gather_points(xyz, idx), idx


def scatter_add(target, idx, updates):
    """Deterministic scatter-add along the point axis (reference scatter
    helpers): target [B,N,C] += updates [B,K,C] at rows idx [B,K]."""
    b = target.shape[0]
    c = target.shape[-1]
    return target.at[
        jnp.arange(b)[:, None, None],
        jnp.asarray(idx)[..., None],
        jnp.arange(c)[None, None, :],
    ].add(updates)


def random_sample(xyz, k: int, key, mask=None):
    """Uniform random downsample without replacement (device-side twin of
    pc_utils.downsample_points): returns (sampled [B,k,C], idx [B,k]).

    With a mask, invalid points get sampling weight 0 (requires >= k valid
    points per cloud for distinct indices).
    """
    b, n, _ = xyz.shape
    keys = jax.random.split(key, b)
    if mask is None:
        idx = jax.vmap(
            lambda kk: jax.random.choice(kk, n, (k,), replace=False)
        )(keys)
    else:
        # Gumbel top-k trick with -inf logits on invalid points.
        logits = jnp.where(mask, 0.0, -jnp.inf)
        g = jax.random.gumbel(key, (b, n)) + logits
        _, idx = jax.lax.top_k(g, k)
    idx = idx.astype(jnp.int32)
    return gather_points(xyz, idx), idx
