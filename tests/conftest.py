"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware — the strategy the
reference lacks entirely (SURVEY.md §4 rebuild implication).

Note: this image boots JAX with an `axon` TPU platform plugin registered from
sitecustomize (which overrides JAX_PLATFORMS), so we must force the CPU
backend via `jax.config` before the first backend initialisation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the suite is compile-dominated; persist compiled executables across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/healnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
