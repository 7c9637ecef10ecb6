"""LRGB combination and luminance synthesis.

Reference: src-tauri/src/core/compose/lrgb.rs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from astroburst_tpu.errors import InvalidInput


def synthesize_luminance(r, g, b) -> jax.Array:
    """BT.709 luminance (lrgb.rs:48-64)."""
    return 0.2126 * jnp.asarray(r) + 0.7152 * jnp.asarray(g) + \
        0.0722 * jnp.asarray(b)


@jax.jit
def _lrgb_kernel(l, r, g, b, lightness_weight, chrominance_weight):
    lum_old = r * 0.2126 + g * 0.7152 + b * 0.0722
    dark = lum_old < 1e-10
    blended = l * lightness_weight
    ratio = (l * lightness_weight + lum_old * (1.0 - lightness_weight)) / \
        jnp.where(dark, 1.0, lum_old)

    def mix(ch):
        v = jnp.clip(ch * ratio * chrominance_weight +
                     l * (1.0 - chrominance_weight), 0.0, 1.0)
        return jnp.where(dark, blended, v)

    return mix(r), mix(g), mix(b)


def apply_lrgb(l, r, g, b, lightness_weight: float = 1.0,
               chrominance_weight: float = 1.0
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Luminance replacement with chrominance blending (lrgb.rs:4-45)."""
    l = jnp.asarray(l)
    r = jnp.asarray(r)
    g = jnp.asarray(g)
    b = jnp.asarray(b)
    if not (l.shape == r.shape == g.shape == b.shape):
        raise InvalidInput(
            f"L dims {l.shape} do not match RGB {r.shape}/{g.shape}/{b.shape}")
    return _lrgb_kernel(l, r, g, b, jnp.float32(lightness_weight),
                        jnp.float32(chrominance_weight))
