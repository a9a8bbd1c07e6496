"""Test harness config: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4: multi-device tests via
xla_force_host_platform_device_count, no real pod needed)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# The container's sitecustomize pre-imports jax and registers the remote
# 'axon' TPU backend before conftest runs, so the env var alone is too late:
# force the platform through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >~15 s on the 2-CPU host (mostly virtual-mesh compile time); "
        "excluded from the default run — use --runslow or -m slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit -m selection overrides the default skip
    skip = pytest.mark.skip(reason="slow (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
