"""Test harness: CPU backend with 8 virtual devices so sharding tests run
anywhere (SURVEY.md section 4 item 3)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# knob is the reliable way to force the CPU backend for tests.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
