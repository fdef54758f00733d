"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware.

The environment's sitecustomize registers a TPU PJRT plugin and forces
``jax_platforms`` at interpreter start; backend initialization is lazy,
so overriding the config here (before any device is touched) pins tests
to the virtual CPU mesh.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
