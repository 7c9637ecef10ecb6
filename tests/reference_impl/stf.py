"""Oracle for src-tauri/src/core/imaging/stf.rs."""

import numpy as np

from tests.reference_impl.stats import ref_valid


def ref_mtf(x, m):
    """mtf (stf.rs:50-58): x<=0 → 0, x>=1 → 1, else the PixInsight
    midtone transfer (f64 math)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    return (m - 1.0) * x / ((2.0 * m - 1.0) * x - m)


def _mtf_balance(m, t):
    """mtf_balance (stf.rs:41-47)."""
    denom = 2.0 * t * m - t - m
    if abs(denom) < 1e-15:
        return 0.5
    return min(max(m * (t - 1.0) / denom, 0.0001), 0.9999)


def ref_auto_stf(stats, target_bg=0.25, shadow_k=-2.8):
    """auto_stf (stf.rs:13-39) → (shadow, midtone, highlight)."""
    if stats["valid_count"] == 0:
        return 0.0, 0.5, 1.0
    rng = max(stats["max"] - stats["min"], 1e-30)
    median_norm = (stats["median"] - stats["min"]) / rng
    sigma_norm = stats["sigma"] / rng
    shadow = min(max(median_norm + shadow_k * sigma_norm, 0.0), 0.98)
    clip_range = max(1.0 - shadow, 1e-15)
    m_clipped = min(max((median_norm - shadow) / clip_range, 0.0), 1.0)
    if m_clipped <= 0.0 or m_clipped >= 1.0:
        midtone = 0.5
    else:
        midtone = _mtf_balance(m_clipped, target_bg)
    return shadow, midtone, 1.0


def _stf_transform(v, stats, shadow, midtone, highlight):
    rng = max(stats["max"] - stats["min"], 1e-30)
    clip_range = max(highlight - shadow, 1e-15)
    norm = (float(v) - stats["min"]) / rng
    clipped = min(max((norm - shadow) / clip_range, 0.0), 1.0)
    return ref_mtf(clipped, midtone)


def ref_apply_stf_u8(data, stats, shadow, midtone, highlight=1.0):
    """apply_stf (stf.rs:89-102): invalid → 0, round-clamp to u8."""
    flat = np.asarray(data, np.float32).ravel()
    out = np.zeros(flat.shape, np.uint8)
    for i, v in enumerate(flat):
        if not ref_valid(np.float32(v)):
            continue
        s = _stf_transform(v, stats, shadow, midtone, highlight)
        out[i] = np.uint8(min(max(round(s * 255.0), 0.0), 255.0))
    return out.reshape(np.asarray(data).shape)


def ref_apply_stf_f32(data, stats, shadow, midtone, highlight=1.0):
    """apply_stf_f32 (stf.rs:104-121): invalid → 0.0."""
    arr = np.asarray(data, np.float32)
    out = np.zeros_like(arr)
    it = np.nditer(arr, flags=["multi_index"])
    for v in it:
        if ref_valid(np.float32(v)):
            out[it.multi_index] = np.float32(
                _stf_transform(float(v), stats, shadow, midtone, highlight))
    return out
