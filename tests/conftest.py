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

# The native C++ batch packer (native/libsvtnative.so) is a build artifact,
# not committed — build it on first run so a fresh clone's suite passes.
_native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
if not os.path.exists(os.path.join(_native_dir, "libsvtnative.so")):
    import subprocess
    subprocess.run(["make", "-C", _native_dir], check=True)


# bench.py's chip-preemption (supervise -> preempt_chip_queues) must never
# touch the REAL measurement queues from inside the test suite: point the
# pidfile glob at a path no queue uses. Preemption tests monkeypatch it.
os.environ["BENCH_QUEUE_PIDFILE_GLOB"] = "/tmp/pytest-no-such-queue-*.pid"


# Fast/slow split (pytest.ini makes `-m "not slow"` the default profile):
# tests listed in tests/slow_manifest.txt — measured >=8s in a full-suite
# duration run (tools/gen_slow_manifest.py) — get the `slow` marker here.
# Parametrized variants inherit it (the manifest stores base nodeids).
_slow_manifest = os.path.join(os.path.dirname(__file__),
                              "slow_manifest.txt")
with open(_slow_manifest) as _fh:
    _SLOW = {line.strip() for line in _fh
             if line.strip() and not line.startswith("#")}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest must run before any jax import"
    return devices


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module", autouse=True)
def _release_compiled_executables():
    """Free jitted executables after every test module.

    The suite compiles hundreds of large interpret-mode Pallas graphs in one
    process; with all of them held live, XLA:CPU's JIT eventually segfaults
    at a fixed offset in libjax_common.so while compiling yet another big
    graph near the END of the suite (observed twice at test_sp's kernel-grad
    case — which passes in a fresh process; classic accumulated-JIT-code
    failure). Tests share almost no jitted functions across modules, so
    dropping the caches costs a few recompiles and caps the accumulation."""
    yield
    jax.clear_caches()
