"""Normalization primitives (reference: src-tauri/src/math/normalization.rs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def min_max_normalize(x: jax.Array) -> jax.Array:
    """(x − min)/(max − min); constant arrays → 0 (normalization.rs:18)."""
    mn = jnp.min(x)
    mx = jnp.max(x)
    rng = mx - mn
    out = (x - mn) / jnp.maximum(rng, 1e-30)
    return jnp.where(rng > 1e-30, out, jnp.zeros_like(x))


@jax.jit
def z_score_normalize(x: jax.Array) -> jax.Array:
    """(x − mean)/std over finite values (normalization.rs:56)."""
    finite = jnp.isfinite(x)
    cnt = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
    mean = jnp.sum(jnp.where(finite, x, 0.0)) / cnt
    var = jnp.sum(jnp.where(finite, (x - mean) ** 2, 0.0)) / cnt
    std = jnp.sqrt(var)
    out = (x - mean) / jnp.maximum(std, 1e-30)
    return jnp.where(std > 1e-30, out, jnp.zeros_like(x))


@jax.jit
def unit_energy_normalize(x: jax.Array) -> jax.Array:
    """x / ‖x‖₂ (normalization.rs:102)."""
    norm = jnp.sqrt(jnp.sum(x * x))
    out = x / jnp.maximum(norm, 1e-30)
    return jnp.where(norm > 1e-30, out, x)


@jax.jit
def compute_mean_sigma(x: jax.Array):
    """Mean + sample std over finite values (normalization.rs:128-163)."""
    finite = jnp.isfinite(x)
    cnt = jnp.sum(finite.astype(jnp.float32))
    mean = jnp.sum(jnp.where(finite, x, 0.0)) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(jnp.where(finite, (x - mean) ** 2, 0.0)) / jnp.maximum(
        cnt - 1.0, 1.0)
    sigma = jnp.sqrt(var)
    empty = cnt < 1.0
    return (jnp.where(empty, 0.0, mean), jnp.where(empty, 0.0, sigma))


def compute_snr(peak, mean, sigma):
    """(peak − mean)/σ with σ≈0 → 0 (normalization.rs:165-170)."""
    return jnp.where(jnp.abs(sigma) < 1e-30, 0.0,
                     (peak - mean) / jnp.maximum(jnp.abs(sigma), 1e-30))
