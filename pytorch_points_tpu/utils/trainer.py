"""Convenience training driver tying the framework together.

Not in the reference (its users hand-rolled loops), but the pieces all
are: SPMD step (parallel.make_train_step), tolerant checkpointing
(save/load_network), NaN guards (check_values), and the colored logger.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import jax

from pytorch_points_tpu.misc.logger import get_logger
from pytorch_points_tpu.parallel import make_mesh, make_train_step
from pytorch_points_tpu.utils.benchmark import device_sync
from pytorch_points_tpu.utils.train_utils import (
    check_values,
    load_network,
    save_network,
)

log = get_logger(__name__)


class Trainer:
    """Minimal loop: step, periodic logging, checkpointing, NaN guard.

    Args:
      model: nnx.Module.
      tx: optax transformation.
      loss_fn: (model, batch) -> scalar.
      mesh: Mesh (default: all devices on a 'data' axis).
      ckpt_dir: checkpoint directory (None = no checkpoints).
      log_every / ckpt_every: step intervals.
      nan_guard: check params for NaN/Inf at every log point (aborts).
    """

    def __init__(self, model, tx, loss_fn, *, mesh=None, ckpt_dir=None,
                 log_every: int = 50, ckpt_every: int = 1000,
                 nan_guard: bool = True, remat: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.step_fn, self.state = make_train_step(
            model, tx, self.mesh, loss_fn, remat=remat
        )
        self.ckpt_dir = ckpt_dir
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.nan_guard = nan_guard
        self.step = 0

    def restore(self, step: int | None = None):
        """Tolerant-restore params from ckpt_dir."""
        params, _ = load_network(self.state.params, self.ckpt_dir, step=step)
        self.state = self.state._replace(params=params)
        log.info("restored checkpoint (step arg: %s)", step)

    def fit(self, batches: Iterable, steps: int | None = None,
            on_log: Callable | None = None, prefetch: int | None = 2):
        """Run the loop over ``batches`` (dicts of arrays).

        Host-side batch preparation overlaps device compute by default:
        any iterable that is not already a data.Prefetcher is wrapped in
        one (depth=``prefetch``; the runtime role of the reference's
        DataLoader workers).  Pass ``prefetch=None`` to iterate directly.

        Returns the final loss (float)."""
        from pytorch_points_tpu.data import Prefetcher

        if prefetch is not None and not isinstance(batches, Prefetcher):
            batches = Prefetcher(batches, depth=prefetch)
        loss = None
        for batch in batches:
            self.state, loss = self.step_fn(self.state, batch)
            self.step += 1
            if self.step % self.log_every == 0:
                device_sync(loss)
                lval = float(loss)
                log.info("step %d  loss %.6f", self.step, lval)
                if self.nan_guard and not jax.numpy.isfinite(lval):
                    check_values(self.state.params, "params")
                    raise FloatingPointError(
                        f"non-finite loss at step {self.step}"
                    )
                if on_log is not None:
                    on_log(self.step, lval)
            if self.ckpt_dir and self.step % self.ckpt_every == 0:
                save_network(self.state.params, self.ckpt_dir, step=self.step)
            if steps is not None and self.step >= steps:
                break
        if self.ckpt_dir:
            save_network(self.state.params, self.ckpt_dir, step=self.step)
        return float(loss) if loss is not None else None
