"""Test configuration.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding logic
is exercised without TPU hardware (the TPU analogue of testing multi-node
without a cluster — SURVEY.md §4).  Environment must be set before the first
jax import, hence this happens at conftest import time.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
# axon PJRT handshake costs ~85 s per process — tests must not pay that or
# occupy the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

# The axon plugin registers itself (and imports jax) via sitecustomize before
# conftest runs, so the env var alone is too late — update the live config and
# deregister the axon factory so jax never initializes the tunnel.
jax.config.update("jax_platforms", "cpu")
xla_bridge._backend_factories.pop("axon", None)

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_allclose(actual, desired, *, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), rtol=rtol, atol=atol
    )
