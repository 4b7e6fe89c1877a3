"""Test harness config: run everything on a virtual 8-device CPU mesh.

This image pre-registers a remote-TPU ("axon") backend via sitecustomize and
pins JAX_PLATFORMS=axon in the environment at interpreter start, so setting
env vars here is too late; instead we force the CPU platform through
``jax.config`` before any backend is initialized. The XLA_FLAGS fake-device
count must still land before the CPU client is created — conftest runs before
any test imports jax.numpy, so this is early enough.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
