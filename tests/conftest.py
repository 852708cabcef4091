"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the JAX-native way to test multi-chip sharding without hardware
(SURVEY.md §4): all tests run on CPU with 8 virtual devices, so pjit/shard_map
paths exercise real collectives.

NOTE: on this machine the `JAX_PLATFORMS` env var is overridden by the axon
TPU plugin, so we must ALSO call jax.config.update — otherwise every tiny test
tunnels to the real TPU chip (slow, and TPU f32 transcendentals have larger
error than CPU).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
