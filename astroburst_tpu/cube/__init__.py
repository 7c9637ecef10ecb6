"""IFU data cubes: eager (device-resident) and lazy (mmap streaming).

Reference: src-tauri/src/core/cube/.
"""

from astroburst_tpu.cube.eager import (GlobalCubeStats, SpectralClassification,
                                       build_wavelength_axis,
                                       classify_spectral_cube, collapse_mean,
                                       collapse_median, compute_global_stats,
                                       extract_spectrum,
                                       normalize_with_global)
from astroburst_tpu.cube.lazy import LazyCube

__all__ = ["GlobalCubeStats", "SpectralClassification",
           "build_wavelength_axis", "classify_spectral_cube",
           "collapse_mean", "collapse_median", "compute_global_stats",
           "extract_spectrum", "normalize_with_global", "LazyCube"]
