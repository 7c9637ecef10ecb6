"""Oracle for src-tauri/src/core/imaging/scnr.rs."""

import numpy as np

LUM_R, LUM_G, LUM_B = 0.2126, 0.7152, 0.0722
INV_RB = 1.0 / (LUM_R + LUM_B)


def ref_apply_scnr(r, g, b, method="average_neutral", amount=1.0,
                   preserve_luminance=True):
    """apply_scnr_inplace (scnr.rs:18-53), scalar per-pixel (f32 math):
    green limit avg/max of R,B; amount lerp; BT.709 luminance
    redistribution to R/B skipping pixels already > 1.0."""
    r = np.array(r, np.float32)
    g = np.array(g, np.float32)
    b = np.array(b, np.float32)
    amount = np.float32(min(max(amount, 0.0), 1.0))
    if amount < 1e-7:
        return r, g, b
    it = np.nditer(g, flags=["multi_index"])
    for gv in it:
        ix = it.multi_index
        rv, bv, gv = r[ix], b[ix], np.float32(gv)
        if method == "average_neutral":
            limit = (rv + bv) * np.float32(0.5)
        else:
            limit = max(rv, bv)
        g_corrected = min(gv, limit)
        g_new = gv + amount * (g_corrected - gv)
        delta_g = gv - g_new
        if preserve_luminance and delta_g > 1e-10 and rv <= 1.0 and bv <= 1.0:
            boost = np.float32(LUM_G) * delta_g * np.float32(INV_RB)
            r[ix] = min(rv + boost, np.float32(1.0))
            b[ix] = min(bv + boost, np.float32(1.0))
        g[ix] = g_new
    return r, g, b
