"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so sharding/pjit paths can be
exercised without TPU hardware (the standard JAX multi-chip test recipe).

NOTE: this image's sitecustomize registers the 'axon' TPU backend in every
interpreter and pins jax_platforms=axon, so the env var alone is not enough;
``jax.config.update`` after import is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2)


@pytest.fixture(autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
