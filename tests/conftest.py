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
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU kills the process (LOG(FATAL) in rendezvous.cc) when the 8
# simulated devices' execution threads fail to join a collective within
# 40s.  On a loaded 1-core host that deadline is routinely missed simply
# because the threads haven't been *scheduled* yet — raise it far above
# any realistic scheduling delay.  (Root-caused 2026-08-17: the full suite
# aborted with a silent SIGABRT mid-e2e-test whenever the box was slow.)
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags.strip()

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
