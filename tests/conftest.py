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


def ref_valid(x):
    """Reference validity: finite && > 1e-7."""
    return np.isfinite(x) & (x > 1e-7)


def ref_median(vals):
    """Reference exact median: even n averages the two middles
    (median.rs:27-43)."""
    v = np.sort(np.asarray(vals, dtype=np.float32))
    n = len(v)
    if n == 0:
        return 0.0
    mid = n // 2
    if n % 2 == 0:
        return (float(v[mid - 1]) + float(v[mid])) / 2.0
    return float(v[mid])


def ref_stats(x):
    """Independent numpy implementation of the reference's exact stats."""
    flat = np.asarray(x, dtype=np.float32).ravel()
    valid = flat[ref_valid(flat)]
    if valid.size == 0:
        return dict(min=0.0, max=0.0, mean=0.0, median=0.0, mad=0.0,
                    sigma=0.0, valid_count=0)
    med = ref_median(valid)
    mad = ref_median(np.abs(valid - np.float32(med)))
    return dict(
        min=float(valid.min()), max=float(valid.max()),
        mean=float(valid.astype(np.float64).sum() / valid.size),
        median=med, mad=mad, sigma=max(mad * 1.4826, 1e-30),
        valid_count=int(valid.size))
