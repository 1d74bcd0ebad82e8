"""Test harness configuration.

Tests run on CPU with 8 virtual XLA host devices so that every
mesh/sharding/collective path is exercised without TPU hardware
(the driver separately dry-runs the multi-chip path, and ``bench.py``
runs on the real chip).

This must run before `jax` is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
