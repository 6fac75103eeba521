"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on host devices. Must set the flags before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The preinstalled 'axon' TPU plugin pre-sets jax_platforms=axon,cpu, which
# silently overrides the JAX_PLATFORMS env var — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare against a float64 oracle; keep matmuls in full fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE = "/root/reference"


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def has_reference():
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
