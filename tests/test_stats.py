"""Stats/quantile parity tests against an independent numpy
implementation of the reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.ops.stats import (compute_histogram,
                                      compute_image_stats,
                                      downsample_histogram)
from tests.conftest import ref_stats


def assert_stats_close(got, ref, rng_span, tol=1e-5):
    assert got.valid_count == ref["valid_count"]
    assert got.min == pytest.approx(ref["min"], abs=1e-7)
    assert got.max == pytest.approx(ref["max"], abs=1e-7)
    assert got.mean == pytest.approx(ref["mean"], rel=1e-5, abs=1e-7)
    assert got.median == pytest.approx(ref["median"], abs=tol * rng_span)
    assert got.mad == pytest.approx(ref["mad"], abs=tol * rng_span)


def test_stats_uniform(rng):
    x = rng.random((200, 300)).astype(np.float32)
    got = compute_image_stats(jnp.asarray(x))
    assert_stats_close(got, ref_stats(x), 1.0)


def test_stats_with_padding_and_nans(rng):
    x = rng.random((100, 100)).astype(np.float32)
    x[:20] = 0.0          # padding → invalid
    x[30, :50] = np.nan   # NaN → invalid
    x[40, :10] = np.inf
    x[41, :10] = 5e-8     # below threshold → invalid
    got = compute_image_stats(jnp.asarray(x))
    ref = ref_stats(x)
    assert_stats_close(got, ref, 1.0)
    assert got.valid_count < x.size


def test_stats_all_invalid():
    x = np.zeros((32, 32), dtype=np.float32)
    got = compute_image_stats(jnp.asarray(x))
    assert got.valid_count == 0
    assert got.median == 0.0 and got.sigma == 0.0


def test_stats_constant_image():
    x = np.full((64, 64), 0.75, dtype=np.float32)
    got = compute_image_stats(jnp.asarray(x))
    assert got.valid_count == 64 * 64
    assert got.median == pytest.approx(0.75, abs=1e-6)
    assert got.mad == pytest.approx(0.0, abs=1e-6)


def test_stats_even_count_averages_middles():
    # 4 values: median must be mean of the two middles (median.rs:27-43)
    x = np.array([[1.0, 2.0], [10.0, 20.0]], dtype=np.float32)
    got = compute_image_stats(jnp.asarray(x))
    assert got.median == pytest.approx(6.0, abs=20.0 * 1e-5)


def test_stats_skewed_distribution(rng):
    x = (rng.random((128, 128)).astype(np.float32) ** 8) * 100.0 + 0.001
    got = compute_image_stats(jnp.asarray(x))
    assert_stats_close(got, ref_stats(x), 100.0)


def test_stats_large_image_hist_path(rng):
    # > 4M px takes the single-rank path (stats.rs:18)
    x = (rng.random((2100, 2100)).astype(np.float32) * 3.0 + 0.5)
    got = compute_image_stats(jnp.asarray(x))
    ref = ref_stats(x)
    # single-rank median differs from pair-average by < one refined bin
    assert got.median == pytest.approx(ref["median"], abs=3.5 * 1e-5)
    assert got.mad == pytest.approx(ref["mad"], abs=3.5 * 1e-5)
    assert got.valid_count == ref["valid_count"]


def test_histogram_matches_numpy(rng):
    x = rng.random((100, 100)).astype(np.float32) + 0.1
    hist = compute_histogram(jnp.asarray(x), 64)
    # reference truncation binning
    v = x.ravel()
    v = v[np.isfinite(v) & (v > 1e-7)]
    idx = np.minimum(((v - hist.min) * 64 / (hist.max - hist.min))
                     .astype(np.int64), 63)
    ref_bins = np.bincount(idx, minlength=64)
    np.testing.assert_array_equal(np.array(hist.bins), ref_bins)
    assert sum(hist.bins) == v.size
    assert len(hist.bin_edges) == 65


def test_histogram_constant_range():
    x = np.full((16, 16), 2.5, dtype=np.float32)
    hist = compute_histogram(jnp.asarray(x), 32)
    assert all(b == 0 for b in hist.bins)  # degenerate range (stats.rs:380)


def test_downsample_histogram():
    from astroburst_tpu.dtypes import Histogram
    h = Histogram(bins=list(range(16)), bin_edges=[float(i) for i in range(17)],
                  min=0.0, max=16.0)
    out = downsample_histogram(h, 4)
    assert out == [0 + 1 + 2 + 3, 4 + 5 + 6 + 7, 8 + 9 + 10 + 11, 12 + 13 + 14 + 15]


def test_stats_core_nd_matches_flat(rng):
    """flatten=False (the GSPMD-shardable ND median path) must be
    numerically identical to the flat scan-chunked path."""
    import jax.numpy as jnp
    from astroburst_tpu.ops.stats import stats_core

    x = rng.gamma(2.0, 40.0, (67, 53)).astype(np.float32)
    x[3, 5] = np.nan
    x[10, :4] = 0.0
    for exact_pair in (False, True):
        flat = stats_core(jnp.asarray(x), exact_pair, flatten=True)
        nd = stats_core(jnp.asarray(x), exact_pair, flatten=False)
        for i, (a, b) in enumerate(zip(flat, nd)):
            # the float total's reduce tree differs (1-ulp); counts are
            # exact integer-valued f32, everything else follows exactly
            tol = 1e-6 if i == 2 else 0
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=tol, atol=0)
