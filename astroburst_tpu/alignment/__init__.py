"""Alignment: FFT phase correlation, star-based affine, warping.

Reference: src-tauri/src/core/alignment/.
"""

from astroburst_tpu.alignment.phase_correlation import (phase_correlate,
                                                        PhaseCorrelationResult)

__all__ = ["phase_correlate", "PhaseCorrelationResult"]
