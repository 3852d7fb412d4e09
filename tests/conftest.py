"""Test harness: run everything on a simulated 8-device CPU platform.

The TPU-native analogue of a fake distributed backend (the reference has
none — SURVEY.md §4): multi-chip sharding tests execute on
`--xla_force_host_platform_device_count=8` CPU devices.

Note: this environment pre-imports jax and pins JAX_PLATFORMS to the TPU
plugin, so we can't switch platforms via env vars; instead XLA_FLAGS is set
before backend init (lazy) and the default device is pointed at CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# exact f32 matmuls for golden-value comparisons (the default on this
# platform is fast/low precision)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (multi-process) tests")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
