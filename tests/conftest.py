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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
