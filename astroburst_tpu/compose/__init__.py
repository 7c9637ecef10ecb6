"""Compose: channel blending, white balance, LRGB, RGB pipeline.

Reference: src-tauri/src/core/compose/.
"""

from astroburst_tpu.compose.channel_blend import blend_channels
from astroburst_tpu.compose.white_balance import select_wb_reference
from astroburst_tpu.compose.lrgb import apply_lrgb, synthesize_luminance

__all__ = ["blend_channels", "select_wb_reference", "apply_lrgb",
           "synthesize_luminance"]
