"""Calibration masters and light-frame calibration.

Reference: src-tauri/src/core/stacking/calibration.rs — master
bias/dark/flat via per-pixel median combine (dark is bias-subtracted,
flat is bias/dark-subtracted then mean-normalized), then
`(raw − bias − r·dark) / flat` with |flat| ≤ 1e-4 guarded and the
result clamped ≥ 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from astroburst_tpu.errors import InvalidInput
from astroburst_tpu.io import load_fits_image
from astroburst_tpu.stacking.combine import _rank_select


@dataclass
class CalibrationConfig:
    master_bias: Optional[jax.Array] = None
    master_dark: Optional[jax.Array] = None
    master_flat: Optional[jax.Array] = None
    dark_exposure_ratio: float = 1.0


@jax.jit
def median_combine(stack: jax.Array) -> jax.Array:
    """Per-pixel median over finite values of [N, H, W]; empty → 0
    (calibration.rs:85-125, select_nth semantics)."""
    finite = jnp.isfinite(stack)
    cnt = jnp.sum(finite.astype(jnp.int32), axis=0)
    svals = jnp.sort(jnp.where(finite, stack, jnp.inf), axis=0)
    med = _rank_select(svals, cnt // 2)
    return jnp.where(cnt > 0, med, 0.0)


def subtract_bias(image, master_bias):
    return jnp.asarray(image) - jnp.asarray(master_bias)


def subtract_dark(image, master_dark, exposure_ratio: float = 1.0):
    return jnp.asarray(image) - jnp.asarray(master_dark) * exposure_ratio


@jax.jit
def _divide_flat_kernel(image, flat):
    ok = jnp.isfinite(flat) & (jnp.abs(flat) > 1e-4)
    return jnp.where(ok, image / jnp.where(ok, flat, 1.0), image)


def divide_flat(image, master_flat):
    return _divide_flat_kernel(jnp.asarray(image), jnp.asarray(master_flat))


def calibrate_image(raw, config: CalibrationConfig) -> jax.Array:
    """Full light calibration chain, clamped ≥ 0 (calibration.rs:47-83)."""
    v = jnp.asarray(raw)
    if config.master_bias is not None:
        v = v - jnp.asarray(config.master_bias)
    if config.master_dark is not None:
        v = v - jnp.asarray(config.master_dark) * config.dark_exposure_ratio
    if config.master_flat is not None:
        v = _divide_flat_kernel(v, jnp.asarray(config.master_flat))
    return jnp.maximum(v, 0.0)


def _load_stack(paths: Sequence[str]) -> jax.Array:
    frames = [jnp.asarray(load_fits_image(p)) for p in paths]
    dims = frames[0].shape
    for i, f in enumerate(frames[1:], 1):
        if f.shape != dims:
            raise InvalidInput(
                f"Dimension mismatch: expected {dims}, got {f.shape} "
                f"({paths[i]})")
    return jnp.stack(frames)


def create_master_bias(bias_paths: Sequence[str]) -> jax.Array:
    if not bias_paths:
        raise InvalidInput("No bias frames provided")
    return median_combine(_load_stack(bias_paths))


def create_master_dark(dark_paths: Sequence[str],
                       master_bias: Optional[jax.Array] = None) -> jax.Array:
    if not dark_paths:
        raise InvalidInput("No dark frames provided")
    stack = _load_stack(dark_paths)
    if master_bias is not None:
        stack = stack - jnp.asarray(master_bias)[None]
    return median_combine(stack)


@jax.jit
def _mean_normalize(flat: jax.Array) -> jax.Array:
    """Normalize by the mean of finite-positive values; invalid pixels
    become 1.0 (calibration.rs:232-251)."""
    ok = jnp.isfinite(flat) & (flat > 0.0)
    cnt = jnp.sum(ok.astype(jnp.float32))
    mean = jnp.sum(jnp.where(ok, flat, 0.0)) / jnp.maximum(cnt, 1.0)
    inv_mean = jnp.where(jnp.abs(mean) > 1e-10, 1.0 / mean, 1.0)
    normalized = jnp.where(ok, flat * inv_mean, 1.0)
    return jnp.where(cnt > 0, normalized, flat)


def create_master_flat(flat_paths: Sequence[str],
                       master_bias: Optional[jax.Array] = None,
                       master_dark: Optional[jax.Array] = None) -> jax.Array:
    if not flat_paths:
        raise InvalidInput("No flat frames provided")
    stack = _load_stack(flat_paths)
    if master_bias is not None:
        stack = stack - jnp.asarray(master_bias)[None]
    if master_dark is not None:
        stack = stack - jnp.asarray(master_dark)[None]
    return _mean_normalize(median_combine(stack))
