"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import (SURVEY.md §5 tier 4 — the
TPU-world "multi-node without a real cluster" mechanism).
"""

import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel ("axon");
# tests run on the virtual-8-device CPU backend unless explicitly opted
# into TPU with PPT_TEST_TPU=1 (used to validate kernels on real hardware).
if os.environ.get("PPT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax

if os.environ.get("PPT_TEST_TPU") != "1":
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
    jax.config.update("jax_platforms", "cpu")
else:
    # Real-TPU runs: persistent compile cache (kernel tests compile many
    # tiny shapes; cold runs took ~15 min).
    _cache = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
