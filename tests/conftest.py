"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/collective tests run hermetically and fast without TPU hardware.

Note: in the dev image ``jax`` is pre-imported at interpreter startup (a
sitecustomize registers the TPU plugin), so setting ``JAX_PLATFORMS`` via
the environment is not enough — we must override through ``jax.config``
before the first backend initialization."""

import os

platform = os.environ.get("MSA_TESTS_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
