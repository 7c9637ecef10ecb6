"""Validity masking and masked reductions.

The validity rule — finite and strictly above the padding threshold —
is the single most load-bearing semantic in the reference
(reference: src-tauri/src/core/imaging/stats.rs:10-13) and must hold in
every statistics/stretch/clip path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from astroburst_tpu.constants import PADDING_THRESHOLD


def validity_mask(x: jax.Array) -> jax.Array:
    """finite && > 1e-7 (stats.rs:11)."""
    return jnp.isfinite(x) & (x > PADDING_THRESHOLD)


def masked_for_min(x: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.where(mask, x, jnp.inf)


def masked_for_max(x: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.where(mask, x, -jnp.inf)


def masked_scan_stats(x: jax.Array):
    """Fused masked (min, max, sum, count) over the whole array.

    Returns f32 min/max/sum and i32 count. Matches scan_stats
    (stats.rs:233-258) except the sum accumulates in f32 tree-reduction
    order (error ~1e-7 relative, inside the 1e-5 parity budget).
    """
    mask = validity_mask(x)
    mn = jnp.min(jnp.where(mask, x, jnp.inf))
    mx = jnp.max(jnp.where(mask, x, -jnp.inf))
    total = jnp.sum(jnp.where(mask, x, 0.0))
    count = jnp.sum(mask.astype(jnp.int32))
    return mn, mx, total, count
