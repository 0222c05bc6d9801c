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

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"


def pytest_collection_modifyitems(config, items):
    """Everything not marked `slow` is the smoke tier: `pytest -m smoke`
    runs the fast suite (<60 s); `pytest` alone still runs everything."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
