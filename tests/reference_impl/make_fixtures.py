"""Regenerate the pinned oracle-output fixtures.

Run from the repo root: ``python tests/reference_impl/make_fixtures.py``.
Review the resulting diff of fixtures/pinned.npz against the cited Rust
before committing — the pins exist so an oracle edit cannot drift
silently together with the implementation under test.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests.reference_impl import (ref_apply_levels, ref_apply_scnr,  # noqa: E402
                                  ref_apply_stf_u8, ref_auto_stf,
                                  ref_drizzle, ref_sigma_clip_combine,
                                  ref_spline_lut, ref_stats)


def main():
    rng = np.random.default_rng(20260816)
    out = {}

    img = rng.normal(0.3, 0.1, (24, 31)).astype(np.float32)
    img[0, :4] = [np.nan, np.inf, -np.inf, 5e-8]
    out["stats_input"] = img
    st = ref_stats(img)
    out["stats_output"] = np.float64([st["min"], st["max"], st["mean"],
                                      st["median"], st["mad"], st["sigma"],
                                      st["valid_count"]])

    sh, mt, hl = ref_auto_stf(st)
    out["auto_stf"] = np.float64([sh, mt, hl])
    out["stf_u8"] = ref_apply_stf_u8(img, st, sh, mt, hl)

    clip_in = rng.normal(100, 5, (12, 40)).astype(np.float32)
    clip_in[3, ::5] = 4000.0
    clip_in[7, ::7] = np.nan
    out["clip_input"] = clip_in
    cv, cr = np.zeros(40, np.float32), np.zeros(40, np.int32)
    for j in range(40):
        v, r = ref_sigma_clip_combine(clip_in[:, j], 2.5, 3.0, 5)
        cv[j], cr[j] = v, r
    out["clip_values"] = cv
    out["clip_rejected"] = cr

    r = rng.random((9, 11)).astype(np.float32)
    g = (rng.random((9, 11)) * 1.4).astype(np.float32)
    b = rng.random((9, 11)).astype(np.float32)
    out["scnr_r_in"], out["scnr_g_in"], out["scnr_b_in"] = r, g, b
    ro, go, bo = ref_apply_scnr(r, g, b, "average_neutral", 0.8, True)
    out["scnr_r"], out["scnr_g"], out["scnr_b"] = ro, go, bo

    out["spline_lut"] = ref_spline_lut([(0.0, 0.0), (0.25, 0.4),
                                        (0.7, 0.65), (1.0, 1.0)])
    out["levels"] = ref_apply_levels(img, black=0.1, white=0.8, gamma=1.6)

    frames = [rng.normal(10, 1, (12, 14)).astype(np.float32)
              for _ in range(4)]
    frames[2][5, 6] = 300.0
    offs = [(0.0, 0.0), (0.4, -0.3), (-0.7, 0.2), (0.1, 0.6)]
    for kern in ("square", "gaussian", "lanczos3"):
        di, dw, drj = ref_drizzle(frames, offs, 2.0, 0.8, kern, 2.5, 2.5, 3)
        out[f"drizzle_{kern}_img"] = di
        out[f"drizzle_{kern}_wgt"] = dw
        out[f"drizzle_{kern}_rej"] = np.int64(drj)
    out["drizzle_frames"] = np.stack(frames)
    out["drizzle_offsets"] = np.float64(offs)

    path = os.path.join(os.path.dirname(__file__), "fixtures", "pinned.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(out)} arrays)")


if __name__ == "__main__":
    main()
