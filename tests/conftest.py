"""Test environment: CPU backend with an 8-device virtual mesh.

The container's sitecustomize imports jax at interpreter start and pins
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late —
the jax config must be updated directly. This replaces the reference's
entire mock apparatus (mocks.py, MOCK_CUDA) with JAX's CPU backend.
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
    return np.random.default_rng(42)
