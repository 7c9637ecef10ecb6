"""Per-channel drizzle → RGB assembly.

Reference: src-tauri/src/core/compose/drizzle_rgb.rs — drizzle each
channel's frame list, crop to common dims, WB (auto/manual/none),
linked or per-channel auto STF, stretch, optional SCNR.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from astroburst_tpu.compose.white_balance import select_wb_reference
from astroburst_tpu.dtypes import (AutoStfConfig, DrizzleConfig, ImageStats,
                                   ScnrConfig, StfParams, WhiteBalance,
                                   WhiteBalanceMode)
from astroburst_tpu.imaging.scnr import apply_scnr
from astroburst_tpu.imaging.stf import apply_stf_f32, auto_stf
from astroburst_tpu.ops.stats import compute_image_stats
from astroburst_tpu.runtime.progress import ProgressHandle
from astroburst_tpu.stacking.drizzle import DrizzleResult, drizzle_stack


@dataclass
class DrizzleRgbConfig:
    drizzle: DrizzleConfig = dc_field(default_factory=DrizzleConfig)
    white_balance: WhiteBalance = dc_field(default_factory=WhiteBalance)
    auto_stretch: bool = True
    linked_stf: bool = True
    scnr: Optional[ScnrConfig] = None


@dataclass
class ProcessedDrizzleRgb:
    r_stretched: jax.Array
    g_stretched: jax.Array
    b_stretched: jax.Array
    r_linear: jax.Array
    g_linear: jax.Array
    b_linear: jax.Array
    stf_r: StfParams
    stf_g: StfParams
    stf_b: StfParams
    stats_r: ImageStats
    stats_g: ImageStats
    stats_b: ImageStats
    wb: Tuple[float, float, float]
    scnr_applied: bool
    out_dims: Tuple[int, int]
    frame_counts: Dict[str, int]


def process_drizzle_rgb(r_image: Optional[jax.Array],
                        g_image: Optional[jax.Array],
                        b_image: Optional[jax.Array],
                        config: DrizzleRgbConfig = DrizzleRgbConfig()
                        ) -> ProcessedDrizzleRgb:
    """Assemble drizzled channel planes into a stretched RGB composite
    (drizzle_rgb.rs:41-150)."""
    dims = [img.shape for img in (r_image, g_image, b_image)
            if img is not None]
    if not dims:
        raise ValueError("No drizzled channels provided")
    out_rows = min(d[0] for d in dims)
    out_cols = min(d[1] for d in dims)

    def crop_or_zero(img):
        if img is None:
            return jnp.zeros((out_rows, out_cols), jnp.float32)
        return jnp.asarray(img)[:out_rows, :out_cols]

    r_img = crop_or_zero(r_image)
    g_img = crop_or_zero(g_image)
    b_img = crop_or_zero(b_image)

    sr_full = compute_image_stats(r_img)
    sg_full = compute_image_stats(g_img)
    sb_full = compute_image_stats(b_img)

    mode = config.white_balance.mode
    if mode == WhiteBalanceMode.AUTO:
        wb = select_wb_reference(sr_full, sg_full, sb_full)
    elif mode == WhiteBalanceMode.MANUAL:
        wb = (config.white_balance.r, config.white_balance.g,
              config.white_balance.b)
    else:
        wb = (1.0, 1.0, 1.0)

    r_wb = r_img * jnp.float32(wb[0])
    g_wb = g_img * jnp.float32(wb[1])
    b_wb = b_img * jnp.float32(wb[2])

    stf_cfg = AutoStfConfig()
    sr = compute_image_stats(r_wb)
    sg = compute_image_stats(g_wb)
    sb = compute_image_stats(b_wb)
    if config.auto_stretch:
        if config.linked_stf:
            merged = (r_wb + g_wb + b_wb) / 3.0
            params = auto_stf(compute_image_stats(merged), stf_cfg)
            pr = pg = pb = params
        else:
            pr = auto_stf(sr, stf_cfg)
            pg = auto_stf(sg, stf_cfg)
            pb = auto_stf(sb, stf_cfg)
    else:
        ident = StfParams()
        pr = pg = pb = ident

    r_s = apply_stf_f32(r_wb, pr, sr)
    g_s = apply_stf_f32(g_wb, pg, sg)
    b_s = apply_stf_f32(b_wb, pb, sb)

    scnr_applied = False
    if config.scnr is not None:
        r_s, g_s, b_s = apply_scnr(r_s, g_s, b_s, config.scnr)
        scnr_applied = True

    return ProcessedDrizzleRgb(
        r_stretched=r_s, g_stretched=g_s, b_stretched=b_s,
        r_linear=r_wb, g_linear=g_wb, b_linear=b_wb,
        stf_r=pr, stf_g=pg, stf_b=pb,
        stats_r=sr, stats_g=sg, stats_b=sb,
        wb=wb, scnr_applied=scnr_applied,
        out_dims=(out_rows, out_cols), frame_counts={})


def drizzle_rgb(r_frames: Sequence, g_frames: Sequence, b_frames: Sequence,
                config: DrizzleRgbConfig = DrizzleRgbConfig(),
                progress: Optional[ProgressHandle] = None
                ) -> Tuple[ProcessedDrizzleRgb, Dict[str, DrizzleResult]]:
    """Drizzle each channel then assemble (drizzle_rgb.rs:159+)."""
    results: Dict[str, DrizzleResult] = {}
    planes = {}
    for name, frames in (("r", r_frames), ("g", g_frames), ("b", b_frames)):
        if frames:
            res = drizzle_stack(frames, config.drizzle, progress)
            results[name] = res
            planes[name] = res.image
            if progress is not None:
                progress.tick_with_stage(f"drizzled {name.upper()}")
        else:
            planes[name] = None
    out = process_drizzle_rgb(planes["r"], planes["g"], planes["b"], config)
    out.frame_counts = {k: v.frame_count for k, v in results.items()}
    return out, results
