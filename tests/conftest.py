"""Test configuration: force an 8-device virtual CPU backend.

pjit/shard_map mesh tests exercise real multi-chip sharding semantics on one
host via XLA's host-platform device-count override (the standard JAX
fake-backend trick; SURVEY.md §4). The platform override must go through
jax.config (not just the environment): this machine's sitecustomize imports
jax at interpreter start with JAX_PLATFORMS=axon already captured.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
