"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; JAX's host-platform device
count gives us an 8-device mesh on CPU so sharding/collective paths are
exercised exactly as they would compile on a real pod slice (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu" via config update, which overrides the env var —
# an explicit later config update is the only way to actually get the CPU
# backend (and with it the forced 8-device host platform).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles; caching them across runs cuts repeat runs to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
