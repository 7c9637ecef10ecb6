"""Astrometry: WCS transforms, plate solving, SPCC color calibration.

Reference: src-tauri/src/core/astrometry/.
"""

from astroburst_tpu.astrometry.wcs import WcsTransform, CelestialCoord

__all__ = ["WcsTransform", "CelestialCoord"]
