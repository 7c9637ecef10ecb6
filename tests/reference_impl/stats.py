"""Oracle for src-tauri/src/core/imaging/stats.rs and math/median.rs."""

import numpy as np


def ref_valid(x):
    """is_valid_pixel: finite && > 1e-7 (stats.rs:11)."""
    return np.isfinite(x) & (x > 1e-7)


def ref_median(vals):
    """exact_median_mut (math/median.rs:27-44): NaNs sort to the end
    (f32_cmp, median.rs:4-18); even n averages the two middles."""
    v = np.sort(np.asarray(vals, dtype=np.float32))
    n = len(v)
    if n == 0:
        return 0.0
    mid = n // 2
    if n % 2 == 0:
        return (float(v[mid - 1]) + float(v[mid])) / 2.0
    return float(v[mid])


def ref_mad(vals, median):
    """exact_mad_mut (math/median.rs:65-80)."""
    return ref_median(np.abs(np.asarray(vals, np.float32)
                             - np.float32(median)))


def ref_stats(x):
    """compute_image_stats exact path (stats.rs:15-83): validity filter,
    min/max/mean with f64 accumulation, selection median/MAD,
    sigma = max(mad·1.4826, 1e-30)."""
    flat = np.asarray(x, dtype=np.float32).ravel()
    valid = flat[ref_valid(flat)]
    if valid.size == 0:
        return dict(min=0.0, max=0.0, mean=0.0, median=0.0, mad=0.0,
                    sigma=0.0, valid_count=0)
    med = ref_median(valid)
    mad = ref_mad(valid, med)
    return dict(
        min=float(valid.min()), max=float(valid.max()),
        mean=float(valid.astype(np.float64).sum() / valid.size),
        median=med, mad=mad, sigma=max(mad * 1.4826, 1e-30),
        valid_count=int(valid.size))
