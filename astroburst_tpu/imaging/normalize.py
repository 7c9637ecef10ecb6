"""Robust asinh preview normalization.

Reference: src-tauri/src/math/simd.rs:160-215 (asinh_normalize_simd,
re-exported as core/imaging/normalize.rs robust_asinh_preview): robust
median/MAD + 1%/99.9% percentile clamp, then asinh(α·(v−median)/σ)
with α = 10; invalid (non-finite or ≤ 1e-7) → 0. The AVX2 fast-asinh
becomes a fused device kernel here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from astroburst_tpu.constants import MAD_TO_SIGMA, PADDING_THRESHOLD
from astroburst_tpu.ops.quantile import masked_rank_values


@jax.jit
def robust_asinh_preview(x: jax.Array) -> jax.Array:
    flat = x.reshape(-1)
    valid = jnp.isfinite(flat) & (flat > PADDING_THRESHOLD)
    cnt = jnp.sum(valid.astype(jnp.int32))
    n = cnt.astype(jnp.float32)
    xm = jnp.where(valid, flat, jnp.inf)
    mn = jnp.min(xm)
    mx = jnp.max(jnp.where(valid, flat, -jnp.inf))
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    mx = jnp.where(jnp.isfinite(mx), mx, 1.0)
    # median_f32_mut rank (len/2, even-averaged), then 1% / 99.9% clamps
    ranks = jnp.stack([jnp.floor(n / 2.0) + 1.0,
                       jnp.floor(n * 0.01) + 1.0,
                       jnp.minimum(jnp.floor(n * 0.999), n - 1.0) + 1.0])
    vals = masked_rank_values(xm, ranks, mn, mx)
    median = vals[0]
    dev = jnp.where(valid, jnp.abs(flat - median), jnp.inf)
    mad = masked_rank_values(dev, (jnp.floor(n / 2.0) + 1.0)[None],
                             jnp.float32(0.0),
                             jnp.maximum(mx - mn, 1e-30))[0]
    sigma = jnp.maximum(mad * MAD_TO_SIGMA, 1e-10)
    low = vals[1]
    high = vals[2]
    alpha = 10.0
    clamped = jnp.clip(x, low, high)
    scaled = (alpha / sigma) * (clamped - median)
    out = jnp.arcsinh(scaled)
    keep = jnp.isfinite(x) & (x > PADDING_THRESHOLD)
    out = jnp.where(keep, out, 0.0).astype(jnp.float32)
    return jnp.where(cnt > 0, out, x)
