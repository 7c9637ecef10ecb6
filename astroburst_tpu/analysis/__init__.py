"""Analysis: star detection, subframe metrics, deconvolution, spectra.

Reference: src-tauri/src/core/analysis/.
"""

from astroburst_tpu.analysis.star_detection import (DetectedStar,
                                                    DetectionResult,
                                                    detect_stars,
                                                    estimate_background)

__all__ = ["DetectedStar", "DetectionResult", "detect_stars",
           "estimate_background"]
