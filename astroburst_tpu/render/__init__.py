"""Rendering: tile pyramids, PNG output helpers.

Reference: src-tauri/src/infra/render/.
"""

from astroburst_tpu.render.tiles import (TileParams, TilePyramid,
                                         generate_tile_pyramid,
                                         generate_tile_pyramid_rgb)

__all__ = ["TileParams", "TilePyramid", "generate_tile_pyramid",
           "generate_tile_pyramid_rgb"]
