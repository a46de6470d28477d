"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests run without a TPU pod via the standard fake-backend
trick (SURVEY.md §4): 8 virtual CPU devices. NOTE: in this environment the
axon TPU plugin overrides the JAX_PLATFORMS *environment variable* at import
time, so the platform must be forced with jax.config.update AFTER importing
jax (and XLA_FLAGS set before the backend initializes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    assert len(jax.devices()) == 8
    return jax.devices()
