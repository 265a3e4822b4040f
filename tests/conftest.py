"""Test config: force a fake 8-device CPU backend (SURVEY.md §4.6).

Must set env vars before jax initializes, hence module level here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the env's axon default
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" via jax.config — the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules (r5).

    The full suite accumulates ~180 tests' jitted programs in one
    process; at that pressure the largest interpret-mode pallas compile
    (test_mesh's AO+soft-shadow frame) segfaulted inside XLA:CPU
    compile/deserialize REPRODUCIBLY, while the same test solo passes.
    Clearing per module bounds live executable memory; cross-module
    recompiles are persistent-cache hits (fast) where the cache is on.
    """
    yield
    jax.clear_caches()
