"""Basic blocks.

The reference's Conv1d/Conv2d(kernel=1)+norm+activation stacks are
pointwise — on TPU they are plain Dense layers applied over the channel
axis, which XLA maps straight onto the MXU as [B*N, C] x [C, C'] matmuls
(far better than 1x1 convs)."""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
from flax import nnx


class SharedMLP(nnx.Module):
    """Pointwise MLP over the last axis of [..., C] tensors.

    Equivalent to the reference's shared Conv2d(1x1) stacks in SA/FP
    layers (SURVEY.md §4.3), channels-last.
    """

    def __init__(
        self,
        channels: Sequence[int],
        *,
        activation: Callable = jax.nn.relu,
        norm: str | None = "layer",
        act_last: bool = True,
        dtype=None,
        rngs: nnx.Rngs,
    ):
        """norm: None | "layer" (stateless, default) | "batch" (the
        reference's Conv+BN blocks; carries nnx.BatchStat state — use
        parallel.make_train_step which threads non-Param state, and
        model.eval() for inference).

        dtype: computation dtype (mixed precision).  Parameters stay
        float32; ``dtype=jnp.bfloat16`` runs every matmul/norm on the
        MXU's native bf16 path — the standard TPU training policy.  The
        caller decides where to cast back (the models here promote at
        the residual/loss boundary)."""
        if len(channels) < 2:
            raise ValueError("channels must include input and output dims")
        self.activation = activation
        self.act_last = act_last
        layers, norms = [], []
        for i, (cin, cout) in enumerate(zip(channels[:-1], channels[1:])):
            layers.append(nnx.Linear(cin, cout, dtype=dtype, rngs=rngs))
            is_last = i == len(channels) - 2
            if norm is not None and (act_last or not is_last):
                if norm == "layer":
                    norms.append(nnx.LayerNorm(cout, dtype=dtype, rngs=rngs))
                elif norm == "batch":
                    norms.append(
                        nnx.BatchNorm(cout, use_running_average=False,
                                      momentum=0.9, dtype=dtype, rngs=rngs)
                    )
                else:
                    raise ValueError(f"unknown norm {norm!r}")
            else:
                norms.append(None)
        self.layers = nnx.List(layers)
        self.norms = nnx.List(norms)

    def __call__(self, x):
        n = len(self.layers)
        for i, (lin, nrm) in enumerate(zip(self.layers, self.norms)):
            x = lin(x)
            is_last = i == n - 1
            if is_last and not self.act_last:
                break
            if nrm is not None:
                x = nrm(x)
            x = self.activation(x)
        return x
