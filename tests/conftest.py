"""Test config: CPU backend with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ASTROBURST_CONFIG_DIR", "/tmp/astroburst_test_config")
os.environ.setdefault("ASTROBURST_DATA_DIR", "/tmp/astroburst_test_data")

import jax

# The environment's sitecustomize registers a remote-TPU PJRT plugin and
# force-sets jax_platforms="axon,cpu", overriding the env var. Tests must
# run on the local CPU backend (8 virtual devices) — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _clear_cache():
    yield
    from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE
    GLOBAL_IMAGE_CACHE.clear()


# Reference oracles live in tests/reference_impl (one function per
# reference file, with Rust line citations and pinned fixtures);
# re-exported here for the older tests that import them from conftest.
from tests.reference_impl import ref_median, ref_stats, ref_valid  # noqa: E402,F401
