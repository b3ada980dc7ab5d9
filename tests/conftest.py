"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip sharding tests run against `xla_force_host_platform_device_count=8`
CPU devices — the JAX-idiomatic fake backend for testing pjit/Mesh code
without TPU hardware (SURVEY.md §4). We also pin the whole suite to CPU so
kernel-correctness tests are fast and deterministic; Pallas kernels run in
interpret mode on CPU (exercised on real TPU by bench.py).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest must run before any jax import"
    return devices


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
