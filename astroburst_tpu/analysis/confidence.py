"""Detection / correlation-surface confidence helpers.

Reference: src-tauri/src/core/analysis/confidence.rs:3-19 —
`compute_detection_snr` (peak-above-background over background sigma,
0 when sigma ≲ ε) and `compute_surface_confidence` (peak z-score
against the surface's mean/sigma). Traced jnp math so both compose
into jitted pipelines.
"""

from __future__ import annotations

import jax.numpy as jnp

from astroburst_tpu.ops.normalization import compute_mean_sigma, compute_snr

_EPS = jnp.finfo(jnp.float32).eps


def compute_detection_snr(peak_above_background, background_sigma):
    """peak / sigma, 0 for degenerate sigma (confidence.rs:3-8)."""
    peak = jnp.asarray(peak_above_background, jnp.float32)
    sigma = jnp.asarray(background_sigma, jnp.float32)
    return jnp.where(sigma <= _EPS, 0.0, peak / jnp.maximum(sigma, _EPS))


def compute_surface_confidence(surface, peak_value):
    """z-score of the peak against the whole surface
    (confidence.rs:10-19); 0 for empty or flat surfaces."""
    surface = jnp.asarray(surface, jnp.float32).ravel()
    if surface.size == 0:
        return jnp.float32(0.0)
    mean, sigma = compute_mean_sigma(surface)
    peak = jnp.asarray(peak_value, jnp.float32)
    return jnp.where(sigma <= _EPS, 0.0, compute_snr(peak, mean, sigma))
