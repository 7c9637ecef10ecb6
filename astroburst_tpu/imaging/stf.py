"""Screen Transfer Function (PixInsight MTF) and auto-stretch.

Reference: src-tauri/src/core/imaging/stf.rs. The MTF scalar math and
auto-STF parameter derivation run on the host in f64 (they are a
handful of scalar ops); the per-pixel application is a fused jitted
elementwise kernel producing f32 or u8 planes on device.

Semantics preserved verbatim: x<=0 → 0, x>=1 → 1; padding/invalid
pixels render black; shadow clamp [0, 0.98]; midtone clamp
[1e-4, 0.9999] via mtf_balance; |denom| guard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from astroburst_tpu.dtypes import AutoStfConfig, ImageStats, StfParams
from astroburst_tpu.ops.masking import validity_mask


def mtf(x: float, m: float) -> float:
    """Midtone transfer function, scalar host version (stf.rs:50-58)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    return (m - 1.0) * x / ((2.0 * m - 1.0) * x - m)


def mtf_balance(m: float, t: float) -> float:
    """Inverse MTF: the midtone that maps m to target t (stf.rs:41-47)."""
    denom = 2.0 * t * m - t - m
    if abs(denom) < 1e-15:
        return 0.5
    return min(max(m * (t - 1.0) / denom, 0.0001), 0.9999)


def auto_stf(stats: ImageStats, config: AutoStfConfig = AutoStfConfig()) -> StfParams:
    """Auto-stretch parameters from robust stats (stf.rs:13-39)."""
    if stats.valid_count == 0:
        return StfParams()
    rng = max(stats.max - stats.min, 1e-30)
    median_norm = (stats.median - stats.min) / rng
    sigma_norm = stats.sigma / rng
    shadow = min(max(median_norm + config.shadow_k * sigma_norm, 0.0), 0.98)
    highlight = 1.0
    clip_range = max(highlight - shadow, 1e-15)
    m_clipped = min(max((median_norm - shadow) / clip_range, 0.0), 1.0)
    if m_clipped <= 0.0 or m_clipped >= 1.0:
        midtone = 0.5
    else:
        midtone = mtf_balance(m_clipped, config.target_bg)
    return StfParams(shadow=shadow, midtone=midtone, highlight=highlight)


def _stf_core(x: jax.Array, dmin: jax.Array, inv_range: jax.Array,
              shadow: jax.Array, inv_clip: jax.Array,
              midtone: jax.Array) -> jax.Array:
    """Vector MTF with the reference's boundary semantics (stf.rs:81-87)."""
    norm = (x - dmin) * inv_range
    c = jnp.clip((norm - shadow) * inv_clip, 0.0, 1.0)
    m = midtone
    denom = (2.0 * m - 1.0) * c - m
    # c in (0,1) with m in (1e-4, 1-1e-4) keeps |denom| >= m*(1-c) > 0;
    # the c<=0 / c>=1 endpoints are handled explicitly like the reference.
    stretched = (m - 1.0) * c / denom
    stretched = jnp.where(c <= 0.0, 0.0, jnp.where(c >= 1.0, 1.0, stretched))
    return stretched


def _params_scalars(params: StfParams, stats: ImageStats):
    rng = max(stats.max - stats.min, 1e-30)
    clip_range = max(params.highlight - params.shadow, 1e-15)
    return (jnp.float32(stats.min), jnp.float32(1.0 / rng),
            jnp.float32(params.shadow), jnp.float32(1.0 / clip_range),
            jnp.float32(params.midtone))


@jax.jit
def _apply_stf_f32(x, dmin, inv_range, shadow, inv_clip, midtone):
    out = _stf_core(x, dmin, inv_range, shadow, inv_clip, midtone)
    return jnp.where(validity_mask(x), out, 0.0).astype(jnp.float32)


@jax.jit
def _apply_stf_u8(x, dmin, inv_range, shadow, inv_clip, midtone):
    out = _stf_core(x, dmin, inv_range, shadow, inv_clip, midtone)
    q = jnp.clip(jnp.round(out * 255.0), 0.0, 255.0)
    return jnp.where(validity_mask(x), q, 0.0).astype(jnp.uint8)


def apply_stf_f32(x: jax.Array, params: StfParams,
                  stats: ImageStats) -> jax.Array:
    """STF'd f32 plane; invalid pixels → 0 (stf.rs:104-120)."""
    return _apply_stf_f32(x, *_params_scalars(params, stats))


def apply_stf_u8(x: jax.Array, params: StfParams,
                 stats: ImageStats) -> jax.Array:
    """STF'd u8 plane for rendering; invalid → black (stf.rs:89-102)."""
    return _apply_stf_u8(x, *_params_scalars(params, stats))


# --- traced variants for fused device pipelines -----------------------------


def auto_stf_traced(dmin, dmax, median, sigma, valid_count,
                    target_bg: float = 0.25, shadow_k: float = -2.8):
    """auto_stf with traced scalar inputs; returns (shadow, midtone)."""
    rng = jnp.maximum(dmax - dmin, 1e-30)
    median_norm = (median - dmin) / rng
    sigma_norm = sigma / rng
    shadow = jnp.clip(median_norm + shadow_k * sigma_norm, 0.0, 0.98)
    clip_range = jnp.maximum(1.0 - shadow, 1e-15)
    m = jnp.clip((median_norm - shadow) / clip_range, 0.0, 1.0)
    denom = 2.0 * target_bg * m - target_bg - m
    balanced = jnp.clip(m * (target_bg - 1.0) /
                        jnp.where(jnp.abs(denom) < 1e-15, 1.0, denom),
                        0.0001, 0.9999)
    midtone = jnp.where((m <= 0.0) | (m >= 1.0) | (jnp.abs(denom) < 1e-15),
                        0.5, balanced)
    invalid = valid_count == 0
    return (jnp.where(invalid, 0.0, shadow).astype(jnp.float32),
            jnp.where(invalid, 0.5, midtone).astype(jnp.float32))


def apply_stf_traced(x, dmin, dmax, shadow, midtone, as_u8: bool = False):
    """Elementwise STF with traced parameters (highlight = 1)."""
    inv_range = 1.0 / jnp.maximum(dmax - dmin, 1e-30)
    inv_clip = 1.0 / jnp.maximum(1.0 - shadow, 1e-15)
    out = _stf_core(x, dmin, inv_range, shadow, inv_clip, midtone)
    if as_u8:
        q = jnp.clip(jnp.round(out * 255.0), 0.0, 255.0)
        return jnp.where(validity_mask(x), q, 0.0).astype(jnp.uint8)
    return jnp.where(validity_mask(x), out, 0.0).astype(jnp.float32)
