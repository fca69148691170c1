"""Benchmark timing helpers.

The axon TPU backend executes asynchronously and — unlike standard JAX
backends — ``block_until_ready()`` does NOT wait for device completion
(verified on hardware: a 90 ms kernel "completed" in 0.0 ms).  The only
reliable synchronization is a device->host transfer.  The device executes
its queue in order, so fetching one scalar from the *last* enqueued result
waits for everything before it.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def device_sync(result) -> None:
    """Force real completion of `result` (and everything enqueued before)."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def measure(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    """Median-of-iters wall seconds per call of ``fn(*args)``, properly
    synced.  ``fn`` should be jitted; compile happens during warmup."""
    for _ in range(warmup):
        device_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        device_sync(r)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
