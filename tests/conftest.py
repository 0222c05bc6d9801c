"""Test configuration: force the JAX CPU backend with 8 virtual devices so
tests are deterministic float32 runs and sharding tests run anywhere (the
bench, not the tests, uses the real TPU).

Note: the ambient environment may register a TPU platform plugin that ignores
the JAX_PLATFORMS env var, so we must use jax.config.update after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU async dispatch executes computations on a background runtime
# thread; one full-suite run wedged (not crashed) in that handoff.
# Synchronous dispatch removes the thread from the picture; tests are
# correctness-only, so the lost overlap is irrelevant.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_executables_per_module():
    """Release every compiled executable when a test module finishes.

    A serial full-suite run deterministically dies ~280 tests in, inside
    XLA:CPU `backend_compile_and_load`, always on the NEXT LARGE compile
    (vocoder decode_frames graphs) — the crash site moves with suite
    content while the test count stays put, and every victim passes in
    isolation. That signature is accumulated per-process jitted-code
    volume (ORC JIT code-region/displacement pressure), not any specific
    test. Dropping the in-process executable caches at module boundaries
    keeps the volume far below the trigger; jitted functions recompile
    transparently, costing a fraction of the suite's wall."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """Everything not marked `slow` is the smoke tier: `pytest -m smoke`
    runs the fast suite (<60 s); `pytest` alone still runs everything."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
