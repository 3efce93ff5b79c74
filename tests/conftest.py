"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX fake-backend idiom called for by SURVEY.md §4 — multi-chip
sharding tests execute on N virtual CPU devices, so CI never needs real TPU
hardware. Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start; the
# config update (pre-backend-init) is the reliable override.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
