"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code paths are exercised without TPU hardware.

Note: the environment's axon TPU plugin force-overwrites
``jax_platforms`` to "axon,cpu" during plugin registration, so setting
the JAX_PLATFORMS env var is not enough — we must also update the
config after importing jax."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
