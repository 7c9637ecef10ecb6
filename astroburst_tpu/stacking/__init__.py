"""Stacking: sigma-clip combine, calibration masters, drizzle.

Reference: src-tauri/src/core/stacking/.
"""

from astroburst_tpu.stacking.combine import (sigma_clip_combine_stack,
                                             stack_images, StackResult)

__all__ = ["sigma_clip_combine_stack", "stack_images", "StackResult"]
