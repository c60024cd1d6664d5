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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
