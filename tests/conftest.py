"""Test configuration: force CPU with 8 virtual devices so sharding /
multi-chip tests run without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere in the test process.
# (Overrides, not setdefault: the ambient environment may pin JAX_PLATFORMS
# to the TPU plugin; tests always run on the virtual 8-device CPU mesh.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient TPU plugin ("axon") wins over JAX_PLATFORMS in this image;
# the config update reliably pins tests to the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
