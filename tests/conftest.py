"""Test config: run JAX on CPU with 8 virtual devices so sharding tests work
without TPU hardware; keep dtypes at float32 for golden comparisons."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax is pre-imported at interpreter startup in this image, so it already
# consumed JAX_PLATFORMS=axon; override through the live config object.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
