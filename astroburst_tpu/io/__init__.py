"""Host-side I/O: FITS/ASDF decode, file dispatch, PNG encode.

This is the L1-infrastructure analog of the reference
(reference: src-tauri/src/infra/). Decode happens on the host with
vectorized numpy over a memory map; planes are pushed to device as
float32 by the runtime cache.
"""

from astroburst_tpu.io.header import HduHeader, HduInfo
from astroburst_tpu.io.fits_reader import (
    FitsImage,
    FitsRgb,
    FitsCube,
    extract_image,
    extract_image_by_index,
    try_extract_rgb,
    extract_cube,
    list_extensions,
    load_fits_image,
)
from astroburst_tpu.io.fits_writer import write_fits_mono, write_fits_rgb
from astroburst_tpu.io.dispatcher import resolve_single_image, resolve_inputs

__all__ = [
    "HduHeader", "HduInfo", "FitsImage", "FitsRgb", "FitsCube",
    "extract_image", "extract_image_by_index", "try_extract_rgb",
    "extract_cube", "list_extensions", "load_fits_image",
    "write_fits_mono", "write_fits_rgb",
    "resolve_single_image", "resolve_inputs",
]
