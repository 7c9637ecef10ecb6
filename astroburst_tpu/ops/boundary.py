"""Boundary index modes and point samplers.

Reference: src-tauri/src/core/imaging/boundary.rs (clamp/wrap/reflect)
and src-tauri/src/core/imaging/sampling.rs (nearest/bilinear/bicubic
point samplers). Vectorized over coordinate arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from astroburst_tpu.ops.resample import catmull_rom


def clamp_index(idx, n: int):
    return jnp.clip(idx, 0, n - 1)


def wrap_index(idx, n: int):
    return jnp.mod(idx, n)


def reflect_index(idx, n: int):
    """Mirror without repeating the edge (boundary.rs:33-53)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    m = jnp.mod(idx, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m < n, m, period - m)


def resolve_index(idx, n: int, mode: str = "clamp"):
    if mode == "wrap":
        return wrap_index(idx, n)
    if mode == "reflect":
        return reflect_index(idx, n)
    return clamp_index(idx, n)


def nearest_sample(img: jax.Array, ys, xs) -> jax.Array:
    """Nearest-neighbor point samples at fractional coords
    (sampling.rs:17-24)."""
    h, w = img.shape
    iy = clamp_index(jnp.round(ys).astype(jnp.int32), h)
    ix = clamp_index(jnp.round(xs).astype(jnp.int32), w)
    return img[iy, ix]


def bilinear_sample(img: jax.Array, ys, xs) -> jax.Array:
    """Bilinear point samples with clamped corners (sampling.rs:27-49)."""
    h, w = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0).astype(img.dtype)
    fx = (xs - x0).astype(img.dtype)
    r0 = clamp_index(y0.astype(jnp.int32), h)
    r1 = clamp_index(y0.astype(jnp.int32) + 1, h)
    c0 = clamp_index(x0.astype(jnp.int32), w)
    c1 = clamp_index(x0.astype(jnp.int32) + 1, w)
    v00 = img[r0, c0]
    v01 = img[r0, c1]
    v10 = img[r1, c0]
    v11 = img[r1, c1]
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


def bicubic_sample(img: jax.Array, ys, xs) -> jax.Array:
    """Catmull-Rom point samples with clamped taps (sampling.rs:52-81).

    Note: per-element gathers — fine for star cutouts/spot checks;
    whole-plane warps should use ops.resample / alignment.affine."""
    h, w = img.shape
    iy = jnp.floor(ys).astype(jnp.int32)
    ix = jnp.floor(xs).astype(jnp.int32)
    fy = ys - jnp.floor(ys)
    fx = xs - jnp.floor(xs)
    out = jnp.zeros(jnp.broadcast_shapes(jnp.shape(ys), jnp.shape(xs)),
                    img.dtype)
    for j in range(4):
        wy = catmull_rom(fy - (j - 1))
        row = clamp_index(iy + (j - 1), h)
        row_val = jnp.zeros_like(out)
        for i in range(4):
            wx = catmull_rom(fx - (i - 1))
            col = clamp_index(ix + (i - 1), w)
            row_val = row_val + wx * img[row, col]
        out = out + wy * row_val
    return out
