"""Arcsinh stretch (reference: src-tauri/src/core/imaging/stretch.rs).

asinh(αx)/asinh(α) with optional gamma; RGB variant shares a global
min/max across channels so color ratios survive (stretch.rs:56-90).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from astroburst_tpu.ops.masking import validity_mask
from astroburst_tpu.ops.stats import compute_image_stats, stats_core


def arcsinh_core(x, dmin, dmax, factor, gamma):
    """Pure traced arcsinh stretch; non-finite → 0 (stretch.rs:30-44)."""
    rng = dmax - dmin
    inv_range = 1.0 / jnp.maximum(rng, 1e-30)
    inv_denom = 1.0 / jnp.arcsinh(factor)
    norm = jnp.clip((x - dmin) * inv_range, 0.0, 1.0)
    stretched = jnp.arcsinh(norm * factor) * inv_denom
    stretched = jnp.where(jnp.abs(gamma - 1.0) > 1e-6,
                          jnp.power(jnp.maximum(stretched, 0.0), gamma),
                          stretched)
    out = jnp.where(jnp.isfinite(x), stretched, 0.0)
    # degenerate range → zeros (stretch.rs:22-24)
    return jnp.where(rng < 1e-10, jnp.zeros_like(x), out).astype(jnp.float32)


@jax.jit
def _arcsinh_kernel(x, dmin, dmax, factor, gamma):
    return arcsinh_core(x, dmin, dmax, factor, gamma)


def arcsinh_stretch_with_stats(data: jax.Array, dmin: float, dmax: float,
                               factor: float, gamma: float = 1.0) -> jax.Array:
    if abs(factor) < 1e-10:
        return jnp.asarray(data)
    return _arcsinh_kernel(jnp.asarray(data), jnp.float32(dmin),
                           jnp.float32(dmax), jnp.float32(factor),
                           jnp.float32(gamma))


def arcsinh_stretch(data: jax.Array, factor: float,
                    gamma: float = 1.0) -> jax.Array:
    stats = compute_image_stats(data)
    return arcsinh_stretch_with_stats(data, stats.min, stats.max, factor,
                                      gamma)


def arcsinh_stretch_rgb_with_stats(
        r, g, b, global_min: Optional[float], global_max: Optional[float],
        factor: float, gamma: float = 1.0):
    """Shared global min/max across channels (stretch.rs:56-90)."""
    if abs(factor) < 1e-10:
        return jnp.asarray(r), jnp.asarray(g), jnp.asarray(b)
    if global_min is None or global_max is None:
        sr = compute_image_stats(r)
        sg = compute_image_stats(g)
        sb = compute_image_stats(b)
        global_min = min(sr.min, sg.min, sb.min)
        global_max = max(sr.max, sg.max, sb.max)
    return tuple(arcsinh_stretch_with_stats(p, global_min, global_max,
                                            factor, gamma)
                 for p in (r, g, b))


def arcsinh_stretch_rgb(r, g, b, factor: float):
    return arcsinh_stretch_rgb_with_stats(r, g, b, None, None, factor, 1.0)
