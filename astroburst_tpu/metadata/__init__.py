"""Metadata: narrowband filter discovery, palette suggestion, presets.

Reference: src-tauri/src/core/metadata/header_discovery.rs and
src/utils/wizard.ts (blend presets / channel bins).
"""

from astroburst_tpu.metadata.header_discovery import (
    NarrowbandFilter, HubbleChannel, Confidence, FilterDetection,
    ChannelSuggestion, PaletteSuggestion, PaletteType, detect_filter,
    detect_from_filename, suggest_palette, suggest_palette_with_type)
from astroburst_tpu.metadata.presets import BLEND_PRESETS, DEFAULT_BINS

__all__ = ["NarrowbandFilter", "HubbleChannel", "Confidence",
           "FilterDetection", "ChannelSuggestion", "PaletteSuggestion",
           "PaletteType", "detect_filter", "detect_from_filename",
           "suggest_palette", "suggest_palette_with_type", "BLEND_PRESETS",
           "DEFAULT_BINS"]
