"""FFT power spectrum for display.

Reference: src-tauri/src/core/analysis/fft.rs — optional symmetric
Hann window, square pow2 FFT, shifted log1p magnitude, area-average
downsample to ≤ 1024.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from astroburst_tpu.ops import fft as F
from astroburst_tpu.ops.resample import area_downsample
from astroburst_tpu.ops.window import hann_symmetric

MAX_DISPLAY_SIZE = 1024


@dataclass
class FftResult:
    spectrum: jax.Array
    display_width: int
    display_height: int
    original_size: int
    windowed: bool


@partial(jax.jit, static_argnames=("size", "apply_window"))
def _spectrum_kernel(data, size: int, apply_window: bool):
    rows, cols = data.shape
    vals = jnp.where(jnp.isfinite(data), data, 0.0)
    if apply_window:
        wy = jnp.asarray(hann_symmetric(rows))
        wx = jnp.asarray(hann_symmetric(cols))
        vals = vals * wy[:, None] * wx[None, :]
    buf = jnp.pad(vals, ((0, size - rows), (0, size - cols)))
    fr, fi = F.fft2_real(buf)
    return F.shifted_log_magnitude(fr, fi)


def compute_power_spectrum(data, apply_window: bool = True) -> FftResult:
    data = jnp.asarray(data)
    rows, cols = data.shape
    size = F.next_power_of_two(max(rows, cols))
    spectrum = _spectrum_kernel(data, size, apply_window)
    if size > MAX_DISPLAY_SIZE:
        spectrum = area_downsample(spectrum, MAX_DISPLAY_SIZE,
                                   MAX_DISPLAY_SIZE)
    dh, dw = spectrum.shape
    return FftResult(spectrum=spectrum, display_width=dw, display_height=dh,
                     original_size=size, windowed=apply_window)
