"""Training utilities (reference pytorch_utils.py, SURVEY.md §3.2 P7).

``save_network`` / ``load_network`` keep the reference's two-function
checkpoint API, backed by orbax-checkpoint (SURVEY.md §6).  Loading is
tolerant: entries whose name or shape doesn't match the target are skipped
with a warning, mirroring the reference's tolerant key matching.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_points_tpu.misc.logger import get_logger

log = get_logger(__name__)


def _canon(key) -> str:
    """Canonical path string: orbax restores plain nested dicts whose
    keystr formatting differs from nnx State paths ("['0']" vs "[0]",
    "['value']" vs ".value") — compare on the token sequence instead."""
    import re

    return "/".join(re.findall(r"[A-Za-z0-9_]+", jax.tree_util.keystr(key)))


def _flatten(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_canon(k): v for k, v in flat}


def save_network(state, path, step: int | None = None, **extra):
    """Checkpoint a pytree (nnx state / params / opt state) with orbax.

    Args:
      state: any pytree of arrays.
      path: checkpoint directory (created if needed).
      step: optional step number -> subdirectory per step.
      extra: additional pytrees saved alongside under their kwarg name.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    payload = {"state": state, **extra}
    with ocp.PyTreeCheckpointer() as ckptr:
        target = os.path.join(path, str(step)) if step is not None else path
        ckptr.save(target, payload, force=True)
    log.info("saved checkpoint to %s", target)
    return target


def load_network(target_state, path, step: int | None = None, *,
                 strict: bool = False):
    """Restore a checkpoint into the structure of ``target_state``.

    Tolerant by default: leaves present in the checkpoint with matching
    path and shape are restored; everything else keeps the target's value
    (with a warning) — the reference's tolerant state_dict loading.

    Returns (restored_state, extra_dict).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    target = os.path.join(path, str(step)) if step is not None else path
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(target)
    loaded = raw.get("state", raw)
    extra = {k: v for k, v in raw.items() if k != "state"}

    flat_loaded = _flatten(loaded)
    paths_target, treedef = jax.tree_util.tree_flatten_with_path(target_state)
    out = []
    for key, val in paths_target:
        ks = _canon(key)
        if ks in flat_loaded:
            cand = flat_loaded[ks]
            if np.shape(cand) == np.shape(val):
                out.append(jnp.asarray(cand, dtype=val.dtype))
                continue
            msg = f"shape mismatch at {ks}: ckpt {np.shape(cand)} vs {np.shape(val)}"
            if strict:
                raise ValueError(msg)
            log.warning("%s — keeping target value", msg)
        else:
            if strict:
                raise KeyError(f"missing checkpoint entry {ks}")
            log.warning("missing checkpoint entry %s — keeping target value", ks)
        out.append(val)
    return jax.tree_util.tree_unflatten(treedef, out), extra


def check_values(tree, name: str = "tensor") -> bool:
    """NaN/Inf guard (reference check_values): True if all leaves finite."""
    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            log.error("non-finite values in %s%s", name,
                      jax.tree_util.keystr(path))
            ok = False
    return ok


def clamp_gradients(grads, max_norm: float = 1.0):
    """Global-norm gradient clipping (reference grad clamp helper)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


def linear_loss_weight(start_weight: float, end_weight: float, start_step: int,
                       end_step: int):
    """Linear loss-weight schedule (reference lr/loss-weight schedules)."""

    def schedule(step):
        t = jnp.clip((step - start_step) / max(end_step - start_step, 1), 0, 1)
        return start_weight + t * (end_weight - start_weight)

    return schedule


def step_lr_schedule(base_lr: float, decay_steps: int, gamma: float = 0.5,
                     min_lr: float = 0.0):
    """StepLR-style learning-rate schedule (reference pytorch_utils lr
    schedules): lr = max(base_lr * gamma^(step // decay_steps), min_lr).

    Pass directly as the learning_rate of any optax optimizer:
    ``optax.adam(step_lr_schedule(1e-3, 1000))``.
    """

    def schedule(step):
        return jnp.maximum(
            base_lr * gamma ** (step // decay_steps), min_lr
        )

    return schedule


def warmup_cosine_lr_schedule(base_lr: float, total_steps: int,
                              warmup_steps: int = 0, min_lr: float = 0.0):
    """Linear warmup then cosine decay to min_lr over total_steps."""

    def schedule(step):
        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        t = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0, 1
        )
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, base_lr * warm, cos)

    return schedule


def weights_init(params, method: str = "xavier_uniform", seed: int = 0):
    """Re-initialize every >=2-D kernel leaf of an nnx state / params pytree
    (reference ``weights_init``; biases and norm scales are left alone).

    Supported methods: xavier_uniform, xavier_normal, kaiming_uniform,
    kaiming_normal, normal(0.02).
    """
    init = {
        "xavier_uniform": jax.nn.initializers.xavier_uniform(),
        "xavier_normal": jax.nn.initializers.xavier_normal(),
        "kaiming_uniform": jax.nn.initializers.he_uniform(),
        "kaiming_normal": jax.nn.initializers.he_normal(),
        "normal": jax.nn.initializers.normal(0.02),
    }[method]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    key = jax.random.PRNGKey(seed)
    out = []
    for path, leaf in flat:
        ks = jax.tree_util.keystr(path)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and "kernel" in ks:
            key, sub = jax.random.split(key)
            out.append(init(sub, leaf.shape, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
