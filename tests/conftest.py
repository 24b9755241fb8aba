"""Test harness: force CPU with a virtual 8-device mesh (SURVEY.md §4).

Must run before any jax import in the test process.
"""
import os

# The session env pins JAX_PLATFORMS=axon (the tunnelled TPU); tests always
# run on the virtual CPU mesh, so force-override.  The axon sitecustomize
# registers its plugin regardless of the env var, so we must also override
# the jax config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "e2e: end-to-end product-path test (slow, compile-bound)")


def pytest_collection_modifyitems(config, items):
    # every e2e test is also slow: the default `-m "not slow"` fast tier
    # (pytest.ini) excludes them without double-marking
    for item in items:
        if item.get_closest_marker("e2e"):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(1219)
