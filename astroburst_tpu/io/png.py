"""PNG encoding (reference: src-tauri/src/infra/render/{grayscale,rgb}.rs)."""

from __future__ import annotations

import numpy as np

from astroburst_tpu.errors import InvalidInput

try:
    from PIL import Image
    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def save_gray_png(pixels: np.ndarray, path: str, bit_depth: int = 8) -> None:
    """Save a mono u8/u16 plane as PNG."""
    if not _HAVE_PIL:
        raise InvalidInput("PNG export requires Pillow")
    arr = np.asarray(pixels)
    if arr.ndim != 2:
        raise InvalidInput(f"expected 2D grayscale, got {arr.shape}")
    if bit_depth == 16:
        Image.fromarray(arr.astype(np.uint16), mode="I;16").save(path)
    else:
        Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


def save_rgb_png(r: np.ndarray, g: np.ndarray, b: np.ndarray, path: str,
                 bit_depth: int = 8) -> None:
    """Save three u8 planes as an RGB PNG."""
    if not _HAVE_PIL:
        raise InvalidInput("PNG export requires Pillow")
    rgb = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    if bit_depth == 16:
        # Pillow lacks 16-bit RGB; widen to 8-bit per channel
        rgb = (rgb.astype(np.uint16) >> 8).astype(np.uint8)
    Image.fromarray(rgb.astype(np.uint8), mode="RGB").save(path)
