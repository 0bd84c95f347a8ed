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

# Persistent compile cache for the whole suite (repo-local, gitignored):
# the big CPU compiles (pipeline programs, training steps) dominate suite
# wall time; on this host they are identical run-to-run, so the second
# `make test` loads them from disk. Subprocess CLI tests inherit via the
# env var (consumed at jax import in the child).
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      ".jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
# the CPU AOT cache loader logs a multi-KB spurious "machine feature" error
# per warm cache hit; suppress (consumed at backend init)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    # 1 s (was 5): on this 1-core host the suite compiles hundreds of 1-5 s
    # programs; caching them cut the warm default tier by minutes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass  # older jax without the persistent cache: cold compiles only

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tests (>~60 s on the 1-core CI host) gated behind "
        "HAIRFAST_SLOW_TESTS=1 — run via `make test-slow`. The default "
        "tier must keep SUITE_TIME.log under the 15-min budget; every "
        "slow-marked test has a cheaper default-tier stand-in or is an "
        "opt-in-feature equality check.")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("HAIRFAST_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier; set HAIRFAST_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
