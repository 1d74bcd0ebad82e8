"""Test harness configuration.

Tests run on CPU with 8 virtual XLA host devices so that every
mesh/sharding/collective path is exercised without TPU hardware
(the driver separately dry-runs the multi-chip path, and ``bench.py``
runs on the real chip).

This must run before `jax` is imported anywhere.
"""

import os

# Force CPU even when the environment pre-registers a TPU platform plugin
# (the sandbox exports JAX_PLATFORMS=<plugin> and registers it via
# sitecustomize, so setdefault is not enough).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
