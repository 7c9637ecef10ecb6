"""SCNR green-noise removal.

Reference: src-tauri/src/core/imaging/scnr.rs — average/maximum-neutral
green limit, amount lerp, and BT.709 luminance redistribution to R/B
(Δ = 0.7152·δG / (0.2126 + 0.0722)) skipping pixels already > 1.0.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from astroburst_tpu.dtypes import ScnrConfig, ScnrMethod

LUM_R = 0.2126
LUM_G = 0.7152
LUM_B = 0.0722
INV_RB_WEIGHT = 1.0 / (LUM_R + LUM_B)


def scnr_core(r, g, b, amount, maximum_neutral: bool,
              preserve_luminance: bool):
    limit = jnp.where(maximum_neutral, jnp.maximum(r, b), (r + b) * 0.5)
    g_corrected = jnp.minimum(g, limit)
    g_new = g + amount * (g_corrected - g)
    delta_g = g - g_new
    if preserve_luminance:
        boost = LUM_G * delta_g * INV_RB_WEIGHT
        apply = (delta_g > 1e-10) & (r <= 1.0) & (b <= 1.0)
        r = jnp.where(apply, jnp.minimum(r + boost, 1.0), r)
        b = jnp.where(apply, jnp.minimum(b + boost, 1.0), b)
    return r, g_new, b


@partial(jax.jit, static_argnames=("maximum_neutral", "preserve_luminance"))
def _scnr_kernel(r, g, b, amount, maximum_neutral, preserve_luminance):
    return scnr_core(r, g, b, amount, jnp.bool_(maximum_neutral),
                     preserve_luminance)


def apply_scnr(r, g, b, config: ScnrConfig = ScnrConfig()
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """SCNR over three channel planes (scnr.rs:18-52); returns new
    planes (device arrays are immutable — the 'inplace' of the
    reference maps to replacing the KEY cache entry)."""
    r = jnp.asarray(r)
    g = jnp.asarray(g)
    b = jnp.asarray(b)
    if r.shape != g.shape or g.shape != b.shape:
        return r, g, b
    amount = min(max(config.amount, 0.0), 1.0)
    if amount < 1e-7:
        return r, g, b
    return _scnr_kernel(r, g, b, jnp.float32(amount),
                        config.method == ScnrMethod.MAXIMUM_NEUTRAL,
                        config.preserve_luminance)
