"""Data-parallel training step via shard_map + psum.

TPU-native replacement for the torch DataParallel/DDP wrappers the
reference's downstream users relied on (SURVEY.md §3.3): one SPMD program
per device over a Mesh 'data' axis; gradients are pmean'd over ICI; the
updated parameters are bitwise identical on every device (deterministic
scatter backwards — no atomics anywhere in the framework)."""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import PartitionSpec as P


class TrainState(typing.NamedTuple):
    """Functional training state: Params, non-Param module state
    (BatchStat etc.), and the optimizer state."""

    params: typing.Any
    rest: typing.Any
    opt_state: typing.Any


def make_train_step(model, tx, mesh, loss_fn, *, data_axis: str = "data",
                    donate: bool = True, remat: bool = False):
    """Build a jitted SPMD train step for an nnx model.

    Args:
      model: nnx.Module (a template; its state becomes the initial params).
      tx: optax gradient transformation.
      mesh: Mesh with a ``data_axis``.
      loss_fn: (model, batch) -> scalar loss; called per device on the
        local batch shard.
      remat: rematerialize the forward pass in the backward
        (jax.checkpoint) — trades FLOPs for HBM at large N (SURVEY.md:
        grouped [B,P,S,C] activations dominate memory).

    Returns:
      (step, state) where ``state`` is a :class:`TrainState` and
      ``step(state, batch) -> (state, loss)``; ``batch`` is a pytree whose
      leaves have a leading batch dim sharded over ``data_axis``.
      Non-Param module state (e.g. BatchNorm statistics) is threaded
      through and pmean-synchronized across devices.
    """
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    opt_state = tx.init(params)

    def per_device(state, batch):
        params, rest, opt_state = state
        # nnx.value_and_grad (not jax.*) so in-call state mutation
        # (BatchNorm running stats) is lifted correctly through the trace.
        m = nnx.merge(graphdef, params, rest)

        def local_loss(m):
            return loss_fn(m, batch)

        if remat:
            local_loss = nnx.remat(local_loss)
        loss, grads = nnx.value_and_grad(local_loss)(m)
        _, _, new_rest = nnx.split(m, nnx.Param, ...)
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        new_rest = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, data_axis)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else x,
            new_rest,
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        import optax

        new_params = optax.apply_updates(params, updates)
        return TrainState(new_params, new_rest, new_opt), loss

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    step = jax.jit(sharded, donate_argnums=(0,) if donate else ())
    return step, TrainState(params, rest, opt_state)


def reconstruction_loss(chamfer_weight: float = 1.0, emd_weight: float = 0.1,
                        emd_kwargs: dict | None = None):
    """Standard config-5 loss: Chamfer + EMD on the reconstructed cloud."""
    from pytorch_points_tpu.ops import chamfer_distance, earth_mover_distance

    kw = emd_kwargs or {}

    def loss_fn(model, batch):
        xyz = batch["points"]
        pred = model(xyz)
        loss = chamfer_weight * chamfer_distance(pred, xyz)
        if emd_weight:
            dist, _ = earth_mover_distance(pred, xyz, **kw)
            loss = loss + emd_weight * jnp.mean(dist)
        return loss

    return loss_fn
