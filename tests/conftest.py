"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Real-TPU benchmarking is done by bench.py; the test suite runs everywhere on
CPU with 8 virtual devices so multi-chip sharding paths are exercised without
hardware.  Env vars must be set before the first jax import (conftest is
imported by pytest before any test module), and we force-override because the
execution environment may pin JAX_PLATFORMS to a hardware plugin.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
