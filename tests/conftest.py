"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set platform env vars before jax initializes a backend (the axon
TPU plugin otherwise grabs the real chip).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_raw(rng):
    """Tiny synthetic OptaGen dump shared across tests."""
    from wcmc_tpu.data.synthetic import synthetic_raw_sample

    raw, gt = synthetic_raw_sample(rng, 48, 48, 4)
    return raw, gt
