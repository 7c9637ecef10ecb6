"""Oracle for src-tauri/src/core/stacking/combine.rs:14-91.

Note the stack clip's iteration-0 median is the SINGLE upper-middle
element (combine.rs:38-40 ``values[mid]`` after select_nth, mid=len/2)
— unlike math/median.rs's exact_median_mut which averages the two
middles for even n. The MAD uses the same single-middle convention.
"""

import numpy as np


def ref_sigma_clip_combine(values, sigma_low, sigma_high, max_iter):
    """Per-pixel clip loop → (combined value, rejected count)."""
    vals = [v for v in values if np.isfinite(v)]
    n = len(vals)
    if n == 0:
        return 0.0, 0
    if n == 1:
        return float(vals[0]), 0
    vals = np.array(vals, dtype=np.float32)
    rejected = 0
    last_center = np.float32(np.nan)
    for it in range(max_iter):
        if len(vals) < 2:
            break
        if it == 0:
            mid = len(vals) // 2
            med = np.sort(vals)[mid]
            devs = np.abs(vals - med)
            mad = np.sort(devs)[len(devs) // 2]
            sig = np.float32(max(float(mad) * 1.4826, 1e-10))
            center = med
        else:
            mean = vals.astype(np.float64).mean()
            var = (((vals.astype(np.float64) - mean) ** 2).sum()
                   / max(len(vals) - 1.0, 1.0))
            center = np.float32(mean)
            sig = np.float32(max(np.sqrt(var), 1e-10))
        last_center = center
        dev = vals - center
        keep = (dev >= -sigma_low * sig) & (dev <= sigma_high * sig)
        removed = int((~keep).sum())
        rejected += removed
        vals = vals[keep]
        if removed == 0:
            break
    if len(vals) == 0:
        return (float(last_center) if np.isfinite(last_center) else 0.0,
                rejected)
    return float(vals.astype(np.float64).mean()), rejected
