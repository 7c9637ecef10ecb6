"""Visualization commands (reference: src-tauri/src/cmd/visualization/mod.rs)."""

from __future__ import annotations

import os
from typing import Optional


from astroburst_tpu import constants as C
from astroburst_tpu.api import helpers
from astroburst_tpu.api.common import Timer, load_from_cache_or_disk, \
    png_path_for
from astroburst_tpu.dtypes import StfParams
from astroburst_tpu.render.tiles import (TileParams, generate_tile_pyramid,
                                         generate_tile_pyramid_rgb)
from astroburst_tpu.runtime.output import resolve_output_dir


def apply_stf_render(path: str, output_dir: str, shadow: float,
                     midtone: float, highlight: float) -> dict:
    """cmd/visualization/mod.rs:12 — render with user STF params."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    entry = load_from_cache_or_disk(path)
    params = StfParams(shadow=shadow, midtone=midtone, highlight=highlight)
    png_path = png_path_for(path, out_dir, suffix="stf")
    helpers.save_stf_preview_png(entry.image, params, entry.stats, png_path)
    h, w = entry.image.shape
    return {
        C.RES_PNG_PATH: png_path,
        C.RES_DIMENSIONS: [w, h],
        C.RES_STF: params.to_dict(),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def generate_tiles(path: str, output_dir: str,
                   tile_size: Optional[int] = None) -> dict:
    """cmd/visualization/mod.rs:50 — mono deep-zoom pyramid."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    entry = load_from_cache_or_disk(path)
    stem = os.path.splitext(os.path.basename(path))[0] or "tiles"
    tiles_dir = os.path.join(out_dir, f"{stem}_tiles")
    pyramid = generate_tile_pyramid(entry.image, tiles_dir,
                                    TileParams(tile_size or 256))
    out = pyramid.to_dict()
    out[C.RES_ELAPSED_MS] = t0.elapsed_ms()
    return out


def generate_tiles_rgb(output_dir: str,
                       tile_size: Optional[int] = None) -> dict:
    """cmd/visualization/mod.rs:73 — composite RGB pyramid."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    er, eg, eb = helpers.load_composite_rgb()
    tiles_dir = os.path.join(out_dir, "composite_tiles")
    pyramid = generate_tile_pyramid_rgb(er.image, eg.image, eb.image,
                                        tiles_dir,
                                        TileParams(tile_size or 256))
    out = pyramid.to_dict()
    out[C.RES_ELAPSED_MS] = t0.elapsed_ms()
    return out
