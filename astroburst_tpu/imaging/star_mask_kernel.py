"""Pallas star-mask raster kernel.

The XLA tile raster (star_mask.py `lax.map` over ~1.1k tiles at 4096²)
is SEQUENTIAL: `lax.map` lowers to a while loop, so every 128² tile
pays its own ~65 µs dispatch-latency step — ~74 ms measured for the
whole paint at 4096²/3000 stars, dwarfing the ~1e8 VPU element-ops of
actual disk math. This kernel runs the same raster as a Pallas grid
(one program per tile, parallel pipeline, no per-tile latency):

- candidate lists: each star's 96×96 window spans ≤ 2×2 raster tiles
  (96 ≤ TILE = 128), so the star→tile map is ≤ 4 entries per star.
  The XLA side flattens them, sorts by tile id (a 4K-element sort —
  trivial next to the [tiles × stars] argsort it replaces) and hands
  the kernel the sorted star ids plus per-tile segment offsets;
- per tile: a dynamic-bound ``fori_loop`` over the tile's segment
  max-accumulates each candidate's smoothstep soft disk
  (star_mask.rs:61-98, exact math of the sequential kernel including
  the 96×96 window clip) on a (TILE, TILE) register block;
- star data (xs, ys, radii — f32) and the list/segment tables (i32)
  ride scalar prefetch; Mosaic reads them at dynamic indices on the
  scalar core (the onepass kernel established f32 SMEM prefetch).

Output parity with `star_mask._mask_kernel`'s raster is exact in f32
(same per-pixel expression, same max-combine order per tile —
candidates are visited in ascending star index within a tile either
way, because the flat (star, corner) index sorts stably by star).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
WINDOW = 96
_HALF = WINDOW // 2


def _make_kernel(tx_n: int, softness_is_arr: bool):
    def kernel(xs_ref, ys_ref, rad_ref, y0_ref, x0_ref, order_ref,
               seg_ref, soft_ref, out_ref):
        t = pl.program_id(0) * tx_n + pl.program_id(1)
        oy = pl.program_id(0) * TILE
        ox = pl.program_id(1) * TILE
        iy = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        gy = iy + oy                       # padded-space coords
        gx = ix + ox
        py = gy.astype(jnp.float32) - float(_HALF)   # image-space
        px = gx.astype(jnp.float32) - float(_HALF)
        softness = soft_ref[0]

        def body(i, acc):
            s = order_ref[i]
            x = xs_ref[s]
            y = ys_ref[s]
            radius = rad_ref[s]
            y0 = y0_ref[s]
            x0 = x0_ref[s]
            soft_radius = radius + softness
            r2_inner = radius * radius
            r2_outer = soft_radius * soft_radius
            fade = jnp.maximum(r2_outer - r2_inner, 1e-10)
            d2 = (px - x) ** 2 + (py - y) ** 2
            tt = jnp.clip((d2 - r2_inner) / fade, 0.0, 1.0)
            val = jnp.where(d2 <= r2_inner, 1.0,
                            jnp.where(d2 <= r2_outer,
                                      1.0 - tt * tt * (3.0 - 2.0 * tt),
                                      0.0))
            val = jnp.where(radius > 0.0, val, 0.0)
            inside = ((gy >= y0) & (gy < y0 + WINDOW) &
                      (gx >= x0) & (gx < x0 + WINDOW))
            return jnp.maximum(acc, jnp.where(inside, val, 0.0))

        acc = jax.lax.fori_loop(seg_ref[t], seg_ref[t + 1], body,
                                jnp.zeros((TILE, TILE), jnp.float32))
        out_ref[:, :] = acc

    return kernel


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def paint_mask_pallas(xs: jax.Array, ys: jax.Array, radii: jax.Array,
                      softness: jax.Array, h: int, w: int,
                      interpret: bool = False) -> jax.Array:
    """[h, w] star mask from ≤K star records (window-clipped soft
    disks, max-combined) — the Pallas raster behind
    ``star_mask._mask_kernel``."""
    k = xs.shape[0]
    hp = -(-(h + WINDOW) // TILE) * TILE
    wp = -(-(w + WINDOW) // TILE) * TILE
    ty_n, tx_n = hp // TILE, wp // TILE
    n_tiles = ty_n * tx_n

    y0 = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h)
    x0 = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w)
    valid = radii > 0.0

    ty_lo, ty_hi = y0 // TILE, (y0 + WINDOW - 1) // TILE
    tx_lo, tx_hi = x0 // TILE, (x0 + WINDOW - 1) // TILE
    # ≤4 (tile, star) entries per star; duplicates and invalid stars
    # park at the sentinel tile n_tiles (sorted to the tail, never
    # visited — seg only covers 0..n_tiles-1)
    t00 = ty_lo * tx_n + tx_lo
    t01 = jnp.where(tx_hi > tx_lo, ty_lo * tx_n + tx_hi, n_tiles)
    t10 = jnp.where(ty_hi > ty_lo, ty_hi * tx_n + tx_lo, n_tiles)
    t11 = jnp.where((tx_hi > tx_lo) & (ty_hi > ty_lo),
                    ty_hi * tx_n + tx_hi, n_tiles)
    tids = jnp.stack([t00, t01, t10, t11], axis=1)
    tids = jnp.where(valid[:, None], tids, n_tiles).reshape(-1)
    order4 = jnp.argsort(tids).astype(jnp.int32)
    sorted_tids = jnp.take(tids, order4)
    order = order4 // 4  # flat (star, corner) → star id; stable in star
    seg = jnp.searchsorted(sorted_tids,
                           jnp.arange(n_tiles + 1, dtype=jnp.int32)
                           ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(ty_n, tx_n),
        in_specs=[],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, *_: (i, j)),
    )
    padded = pl.pallas_call(
        _make_kernel(tx_n, False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(xs.astype(jnp.float32), ys.astype(jnp.float32),
      radii.astype(jnp.float32), y0, x0, order,
      seg, jnp.asarray(softness, jnp.float32).reshape(1))
    return padded[_HALF:_HALF + h, _HALF:_HALF + w]
