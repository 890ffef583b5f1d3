"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this happens at
conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and no accidental x64.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; the config flag set post-import wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (realistic shapes/multi-process)")
