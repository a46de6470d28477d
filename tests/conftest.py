"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests run without a TPU pod via the standard fake-backend
trick (SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8 with
the CPU platform. Must be set before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
