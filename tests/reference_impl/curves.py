"""Oracle for src-tauri/src/core/imaging/curves.rs."""

import numpy as np


def _fritsch_carlson_tangents(pts):
    """curves.rs:112-156: monotone cubic Hermite tangents."""
    n = len(pts)
    if n < 2:
        return [0.0] * n
    if n == 2:
        slope = (pts[1][1] - pts[0][1]) / max(pts[1][0] - pts[0][0], 1e-15)
        return [slope, slope]
    deltas, slopes = [], []
    for i in range(n - 1):
        dx = max(pts[i + 1][0] - pts[i][0], 1e-15)
        deltas.append(dx)
        slopes.append((pts[i + 1][1] - pts[i][1]) / dx)
    m = [0.0] * n
    m[0] = slopes[0]
    m[n - 1] = slopes[n - 2]
    for i in range(1, n - 1):
        if np.sign(slopes[i - 1]) != np.sign(slopes[i]):
            m[i] = 0.0
        else:
            m[i] = (slopes[i - 1] + slopes[i]) * 0.5
    for i in range(n - 1):
        if abs(slopes[i]) < 1e-15:
            m[i] = 0.0
            m[i + 1] = 0.0
            continue
        alpha = m[i] / slopes[i]
        beta = m[i + 1] / slopes[i]
        tau = alpha * alpha + beta * beta
        if tau > 9.0:
            s = 3.0 / np.sqrt(tau)
            m[i] = s * alpha * slopes[i]
            m[i + 1] = s * beta * slopes[i]
    return m


def _hermite_eval(pts, tangents, x):
    """curves.rs:158-184."""
    n = len(pts)
    if x <= pts[0][0]:
        return pts[0][1]
    if x >= pts[n - 1][0]:
        return pts[n - 1][1]
    seg = 0
    for i in range(1, n):
        if x < pts[i][0]:
            seg = i - 1
            break
    dx = max(pts[seg + 1][0] - pts[seg][0], 1e-15)
    t = (x - pts[seg][0]) / dx
    t2, t3 = t * t, t * t * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + t
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2
    return (h00 * pts[seg][1] + h10 * dx * tangents[seg]
            + h01 * pts[seg + 1][1] + h11 * dx * tangents[seg + 1])


def ref_spline_lut(points):
    """SplineLut::from_points (curves.rs:70-92): sort/dedup control
    points, force (0,0)/(1,1) endpoints, bake a 4096-entry f32 LUT."""
    pts = sorted([(float(x), float(y)) for x, y in points])
    dedup = []
    for p in pts:
        if dedup and abs(p[0] - dedup[-1][0]) < 1e-9:
            continue
        dedup.append(p)
    pts = dedup
    if not pts or pts[0][0] > 1e-6:
        pts.insert(0, (0.0, 0.0))
    if not pts or pts[-1][0] < 1.0 - 1e-6:
        pts.append((1.0, 1.0))
    tangents = _fritsch_carlson_tangents(pts)
    lut = np.zeros(4096, np.float32)
    for i in range(4096):
        t = i / 4095.0
        lut[i] = np.float32(min(max(_hermite_eval(pts, tangents, t),
                                    0.0), 1.0))
    return lut


def ref_apply_levels(data, black=0.0, white=1.0, gamma=1.0):
    """apply_levels (curves.rs:25-52): non-finite/negative → 0, then
    ((v-black)/(white-black)) clamped, ^(1/gamma)."""
    arr = np.asarray(data, np.float32)
    inv_range = 1.0 / max(white - black, 1e-15)
    inv_gamma = 1.0 / min(max(gamma, 0.01), 10.0)
    out = np.zeros_like(arr)
    it = np.nditer(arr, flags=["multi_index"])
    for v in it:
        v = float(v)
        if not np.isfinite(v) or v < 0.0:
            continue
        norm = min(max((v - black) * inv_range, 0.0), 1.0)
        out[it.multi_index] = np.float32(norm ** inv_gamma)
    return out
