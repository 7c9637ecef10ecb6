"""Composite cache helpers, linked STF, preview rendering.

Reference: src-tauri/src/cmd/helpers.rs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu import constants as C
from astroburst_tpu.dtypes import AutoStfConfig, ImageStats, StfParams
from astroburst_tpu.imaging.stf import apply_stf_u8, auto_stf
from astroburst_tpu.io.png import save_gray_png, save_rgb_png
from astroburst_tpu.ops.ipc import nearest_downsample
from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE


def stats_json(stats: ImageStats) -> dict:
    """Short stats payload (helpers.rs:146-154)."""
    return {
        C.RES_MIN: stats.min,
        C.RES_MAX: stats.max,
        C.RES_MEAN: stats.mean,
        C.RES_SIGMA: stats.sigma,
        C.RES_MEDIAN: stats.median,
    }


def stats_json_full(stats: ImageStats) -> dict:
    """Stats payload incl. MAD (helpers.rs:156-165)."""
    d = stats_json(stats)
    d[C.RES_MAD] = stats.mad
    return d


def stf_json(stf: StfParams) -> dict:
    return stf.to_dict()


def insert_composite_and_orig(r, g, b, stats_r: ImageStats,
                              stats_g: ImageStats,
                              stats_b: ImageStats) -> None:
    """Seed ORIG (immutable blend output) and KEY (working copy) with the
    same device arrays — zero-copy like the reference's shared Arcs
    (helpers.rs:127-144)."""
    for key_orig, key_work, plane, st in [
        (C.COMPOSITE_ORIG_R, C.COMPOSITE_KEY_R, r, stats_r),
        (C.COMPOSITE_ORIG_G, C.COMPOSITE_KEY_G, g, stats_g),
        (C.COMPOSITE_ORIG_B, C.COMPOSITE_KEY_B, b, stats_b),
    ]:
        entry = GLOBAL_IMAGE_CACHE.insert(key_orig, plane, stats=st)
        # same device buffer in both keys
        GLOBAL_IMAGE_CACHE.insert(key_work, entry.image, stats=st)


def compute_linked_stf_with_stats(
        stats_r: ImageStats, stats_g: ImageStats, stats_b: ImageStats,
        config: AutoStfConfig = AutoStfConfig()) -> Tuple[StfParams, ImageStats]:
    """Linked STF from merged channel statistics (helpers.rs:185-202)."""
    combined = ImageStats(
        min=min(stats_r.min, stats_g.min, stats_b.min),
        max=max(stats_r.max, stats_g.max, stats_b.max),
        mean=(stats_r.mean + stats_g.mean + stats_b.mean) / 3.0,
        median=(stats_r.median + stats_g.median + stats_b.median) / 3.0,
        sigma=math.sqrt((stats_r.sigma ** 2 + stats_g.sigma ** 2 +
                         stats_b.sigma ** 2) / 3.0),
        mad=(stats_r.mad + stats_g.mad + stats_b.mad) / 3.0,
        valid_count=stats_r.valid_count,
    )
    return auto_stf(combined, config), combined


def compute_linked_stf(stats_r, stats_g, stats_b,
                       config: AutoStfConfig = AutoStfConfig()) -> StfParams:
    return compute_linked_stf_with_stats(stats_r, stats_g, stats_b, config)[0]


def save_preview_png(u8_plane, path: str,
                     max_dim: int = 4096) -> None:
    """Downsample (device) + save mono preview.

    Prefer save_stf_preview_png when you have the f32 plane: a strided
    slice of a u8 device array relayouts sub-byte lanes (measured 48 ms
    vs 4 ms at 4096² on v5e); here it only costs when the plane
    exceeds max_dim."""
    small = nearest_downsample(u8_plane, max_dim)
    save_gray_png(np.asarray(small), path)


def save_stf_preview_png(plane, stf: StfParams, stats: ImageStats,
                         path: str, max_dim: int = 4096) -> None:
    """NN-downsample the f32 plane FIRST, then STF-map + quantize.

    Pointwise STF commutes with subsampling, and slicing in f32 avoids
    the u8 relayout penalty."""
    small = nearest_downsample(plane, max_dim)
    save_gray_png(np.asarray(apply_stf_u8(small, stf, stats)), path)


def render_rgb_preview_with_stf(r, g, b, stf_r: StfParams, stf_g: StfParams,
                                stf_b: StfParams, stats_r: ImageStats,
                                stats_g: ImageStats, stats_b: ImageStats,
                                path: str, max_dim: int = 4096) -> None:
    """Downsample each channel (f32, device), STF-map, save RGB PNG
    (helpers.rs:264-322). Downsample-first: see save_stf_preview_png."""
    planes = []
    for plane, stf, st in ((r, stf_r, stats_r), (g, stf_g, stats_g),
                           (b, stf_b, stats_b)):
        small = nearest_downsample(plane, max_dim)
        planes.append(np.asarray(apply_stf_u8(small, stf, st)))
    save_rgb_png(planes[0], planes[1], planes[2], path)


def stats_brief(stats: ImageStats) -> dict:
    """The 4-field stats payload used by compose responses."""
    return {C.RES_MEDIAN: stats.median, C.RES_MEAN: stats.mean,
            C.RES_MIN: stats.min, C.RES_MAX: stats.max}


def composite_png_path(output_dir: str) -> str:
    """Timestamped composite preview path; stale composites removed
    (cmd/compose/rgb.rs:19-33)."""
    import os
    import time
    try:
        for name in os.listdir(output_dir):
            if name.startswith("rgb_composite") and name.endswith(".png"):
                try:
                    os.remove(os.path.join(output_dir, name))
                except OSError:
                    pass
    except OSError:
        pass
    return os.path.join(output_dir, f"rgb_composite_{int(time.time()*1000)}.png")


def _require(key: str):
    from astroburst_tpu.errors import CacheMiss
    entry = GLOBAL_IMAGE_CACHE.get(key)
    if entry is None or entry.stats is None:
        raise CacheMiss(f"cache key not found: {key}")
    return entry


def load_composite_rgb():
    """KEY working planes (helpers.rs load_composite_rgb)."""
    return (_require(C.COMPOSITE_KEY_R), _require(C.COMPOSITE_KEY_G),
            _require(C.COMPOSITE_KEY_B))


def load_composite_orig_rgb():
    """ORIG immutable planes."""
    return (_require(C.COMPOSITE_ORIG_R), _require(C.COMPOSITE_ORIG_G),
            _require(C.COMPOSITE_ORIG_B))


def load_orig_or_composite():
    try:
        return load_composite_orig_rgb()
    except Exception:
        return load_composite_rgb()


def insert_composite_rgb(r, g, b, stats_r, stats_g, stats_b) -> None:
    """Replace only the KEY working planes (color pipeline writes)."""
    GLOBAL_IMAGE_CACHE.insert(C.COMPOSITE_KEY_R, r, stats=stats_r)
    GLOBAL_IMAGE_CACHE.insert(C.COMPOSITE_KEY_G, g, stats=stats_g)
    GLOBAL_IMAGE_CACHE.insert(C.COMPOSITE_KEY_B, b, stats=stats_b)


def parse_wb(mode: Optional[str], r: Optional[float], g: Optional[float],
             b: Optional[float]):
    from astroburst_tpu.dtypes import WhiteBalance, WhiteBalanceMode
    m = (mode or "auto").lower()
    if m == C.WB_MODE_MANUAL:
        return WhiteBalance(mode=WhiteBalanceMode.MANUAL, r=r or 1.0,
                            g=g or 1.0, b=b or 1.0)
    if m == C.WB_MODE_NONE:
        return WhiteBalance(mode=WhiteBalanceMode.NONE)
    return WhiteBalance(mode=WhiteBalanceMode.AUTO)


def parse_scnr_config(enabled: Optional[bool], method: Optional[str],
                      amount: Optional[float],
                      preserve_luminance: Optional[bool]):
    from astroburst_tpu.dtypes import ScnrConfig, ScnrMethod
    if not enabled:
        return None
    return ScnrConfig(
        method=ScnrMethod.parse(method),
        amount=float(amount if amount is not None else C.DEFAULT_SCNR_AMOUNT),
        preserve_luminance=bool(preserve_luminance or False))


def parse_align_method(s: Optional[str]):
    from astroburst_tpu.dtypes import AlignMethod
    return AlignMethod.parse(s)


@jax.jit
def _to_u8(x):
    return jnp.clip(jnp.round(
        jnp.where(jnp.isfinite(x), x, 0.0) * 255.0), 0, 255).astype(jnp.uint8)


def render_rgb_preview(r_stretched, g_stretched, b_stretched, path: str,
                       max_dim: int = 4096) -> None:
    """Assume planes already stretched to [0,1]; quantize + save
    (helpers.rs:204-262). The u8 quantize jit lives at module level —
    a per-call closure re-compiled on every preview (a remote-compile
    round trip per call on tunneled hosts)."""
    planes = [np.asarray(_to_u8(nearest_downsample(p, max_dim)))
              for p in (r_stretched, g_stretched, b_stretched)]
    save_rgb_png(planes[0], planes[1], planes[2], path)
