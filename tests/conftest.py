"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(Mesh/pjit) are exercised without TPU hardware — the TPU-world equivalent of
testing multi-node without a cluster.  Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon/TPU is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup and pins
# jax_platforms via jax.config.update, so the env var alone is ignored —
# override the already-imported config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
