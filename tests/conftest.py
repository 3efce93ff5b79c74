"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX fake-backend idiom called for by SURVEY.md §4 — multi-chip
sharding tests execute on N virtual CPU devices, so CI never needs real TPU
hardware. Must run before the first ``import jax`` anywhere.
"""

import os

# The package-level persistent XLA cache (imcui_tpu/__init__.py) is for
# minutes-long TPU compiles; on CPU it is near-free to recompile, and
# loading stale cross-era XLA:CPU AOT entries from it has segfaulted
# inside backend_compile_and_load (cpu_aot_loader machine-feature
# mismatch → "execution errors such as SIGILL"). Must be set before the
# first imcui_tpu import.
os.environ["IMCUI_TPU_NO_COMPILE_CACHE"] = "1"

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


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_cache():
    """Drop compiled executables after every test module.

    The suite compiles ~60 distinct model programs; keeping every
    executable + its LLVM state live in one process grew RSS until late
    compiles started segfaulting inside XLA (seen 3× at >200 tests in,
    always under backend_compile_and_load). Cross-module executable
    reuse is negligible — each module exercises its own models — so the
    bound costs almost nothing."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
