"""Test configuration: force an 8-device virtual CPU backend.

Must run before jax is imported anywhere: pjit/shard_map mesh tests exercise
real multi-chip sharding semantics on one host via XLA's host-platform
device-count override (the standard JAX fake-backend trick; SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
