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
