"""Fused Pallas shift + sigma-clip kernel.

The stacking hot loop is: bicubic-shift every frame by its alignment
offset, then per-pixel sigma-clip across frames. Done separately that
costs ~3 full HBM round-trips of the [N, H, W] stack. This kernel does
both in one pass over the stack.

Two-stage design (v2):

1. **Integer shifts are applied on the HBM side** — each frame is
   edge-padded and re-sliced at its integer offset (one fused XLA
   pad+dynamic-slice copy). After this, every frame's source window
   for an output block sits at the SAME, statically (8, 128)-tile-
   aligned coordinates: the left pad of 1 row/1 lane plus block
   origins that are multiples of (8, 128) keeps the 4-tap halo
   (−1..+2) inside an aligned window of block+(8, 128).
2. **The kernel fetches one [N, win_h, win_w] window per block in a
   single DMA** (double-buffered across grid steps), applies the
   per-frame fractional Catmull-Rom taps as static slices — no
   dynamic rotates — and runs the clip loop (clip_kernel._clip_body)
   on the register tiles.

The v1 kernel issued N separate window DMAs per block at per-frame
dynamic offsets and fixed up sub-tile residuals with dynamic
`pltpu.roll`s; at 16 frames × 801 blocks the scalar core spent more
time issuing DMA descriptors than the VPU spent clipping (~1.5 ms per
frame). One multi-dim strided DMA per block removes that wall.

Semantics: identical to shift_bicubic + sigma_clip_core for offsets
with |integer part| ≤ MAX_SHIFT (the padded margin). The caller clamps
offsets into that range; stacking offsets beyond ~256 px indicate a
failed alignment anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from astroburst_tpu.stacking.clip_kernel import _clip_body

MAX_SHIFT = 256
BLOCK_H = 64
BLOCK_W = 512
# halo: 1 left (tap −1, absorbed by the 1-row/1-lane left pad) + 2
# right (taps +1, +2), rounded up to the (8, 128) tile
_HALO_H = 8
_HALO_W = 128


def _cr_weights(f):
    """Catmull-Rom weights for taps −1..2 at fractional offset f."""
    ws = []
    for j in range(4):
        t = f - (j - 1)
        a = jnp.abs(t)
        inner = a * a * (1.5 * a - 2.5) + 1.0
        outer = a * (a * (2.5 - 0.5 * a) - 4.0) + 2.0
        ws.append(jnp.where(a <= 1.0, inner, jnp.where(a <= 2.0, outer,
                                                       0.0)))
    return ws


_COPY_RB = 256  # rows per integer-shift copy block


def _preshift_integer(padded: jax.Array, shifts: jax.Array, hp: int,
                      wp: int, interpret: bool = False) -> jax.Array:
    """out[k, u, v] = padded[k, MAX_SHIFT−1+ky[k]+u, MAX_SHIFT−1+kx[k]+v].

    XLA's dynamic-slice relayouts ~45 GB/s on tiled TPU memory (~20 ms
    for 16 frames); this copy kernel streams big aligned windows and
    fixes the sub-tile residual with two rotates per 256-row block.
    """
    n = padded.shape[0]
    win_rb = _COPY_RB + 8
    win_w = wp + 128
    grid = (n, pl.cdiv(hp, _COPY_RB))
    n_steps = grid[0] * grid[1]
    grid_rb = grid[1]

    def issue(step, shift_ref, padded_hbm, scratch, sems, slot):
        k = step // grid_rb
        rb = step % grid_rb
        base_r = MAX_SHIFT - 1 + shift_ref[k, 0] + rb * _COPY_RB
        base_c = MAX_SHIFT - 1 + shift_ref[k, 1]
        ry = pl.multiple_of((base_r // 8) * 8, 8)
        cx = pl.multiple_of((base_c // 128) * 128, 128)
        pltpu.make_async_copy(
            padded_hbm.at[k, pl.ds(ry, win_rb), pl.ds(cx, win_w)],
            scratch.at[slot], sems.at[slot]).start()
        return base_r - ry, base_c - cx

    def kernel(shift_ref, padded_hbm, out_ref, scratch, sems):
        k = pl.program_id(0)
        rb = pl.program_id(1)
        step = k * grid_rb + rb
        slot = step % 2

        @pl.when(step == 0)
        def _first():
            issue(0, shift_ref, padded_hbm, scratch, sems, 0)

        @pl.when(step + 1 < n_steps)
        def _prefetch():
            issue(step + 1, shift_ref, padded_hbm, scratch, sems,
                  (step + 1) % 2)

        base_r = MAX_SHIFT - 1 + shift_ref[k, 0] + rb * _COPY_RB
        base_c = MAX_SHIFT - 1 + shift_ref[k, 1]
        r_off = base_r - (base_r // 8) * 8
        c_off = base_c - (base_c // 128) * 128

        pltpu.make_async_copy(scratch.at[slot], scratch.at[slot],
                              sems.at[slot]).wait()
        t = pltpu.roll(scratch[slot], (win_rb - r_off) % win_rb, 0)
        t = pltpu.roll(t, (win_w - c_off) % win_w, 1)
        out_ref[0] = t[:_COPY_RB, :wp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, _COPY_RB, wp),
                               lambda k, rb, *_: (k, rb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win_rb, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        interpret=interpret,
    )(shifts, padded)


def _make_kernel(n: int, h: int, w: int, sigma_low: float,
                 sigma_high: float, max_iter: int, block_h: int,
                 block_w: int, grid_w: int):
    win_h = block_h + _HALO_H
    win_w = block_w + _HALO_W

    def issue_dma(step, stack_hbm, scratch, sems, slot):
        row0 = pl.multiple_of((step // grid_w) * block_h, 8)
        col0 = pl.multiple_of((step % grid_w) * block_w, 128)
        pltpu.make_async_copy(
            stack_hbm.at[:, pl.ds(row0, win_h), pl.ds(col0, win_w)],
            scratch.at[slot], sems.at[slot]).start()

    def kernel(shift_ref, frac_ref, stack_hbm, out_ref, rej_ref, scratch,
               sems):
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        step = bi * grid_w + bj
        n_steps = pl.num_programs(0) * grid_w
        slot = step % 2
        row0 = bi * block_h
        col0 = bj * block_w

        @pl.when(step == 0)
        def _first():
            issue_dma(0, stack_hbm, scratch, sems, 0)

        @pl.when(step + 1 < n_steps)
        def _prefetch():
            issue_dma(step + 1, stack_hbm, scratch, sems, (step + 1) % 2)

        pltpu.make_async_copy(scratch.at[slot], scratch.at[slot],
                              sems.at[slot]).wait()

        yy = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      0).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      1).astype(jnp.float32)
        rowf = row0.astype(jnp.float32)
        colf = col0.astype(jnp.float32)

        vals = []
        for k in range(n):
            tile = scratch[slot, k]
            wy = _cr_weights(frac_ref[k, 0])
            wx = _cr_weights(frac_ref[k, 1])
            # window row j corresponds to source row (block row −1 + j)
            # of the integer-shifted frame, so the 4 taps are the
            # static slices j..j+block
            tmp = None
            for j in range(4):
                term = wy[j] * tile[j:j + block_h, :]
                tmp = term if tmp is None else tmp + term
            out = None
            for j in range(4):
                term = wx[j] * tmp[:, j:j + block_w]
                out = term if out is None else out + term
            # outside-source pixels are exactly 0 (align.rs:48-51) and
            # participate in the clip as finite values, matching the
            # reference's shifted frames
            dy = shift_ref[k, 0].astype(jnp.float32) + frac_ref[k, 0]
            dx = shift_ref[k, 1].astype(jnp.float32) + frac_ref[k, 1]
            sy = yy + rowf + dy
            sx = xx + colf + dx
            inside = ((sy >= -0.5) & (sy <= h - 0.5) & (sx >= -0.5) &
                      (sx <= w - 0.5))
            vals.append(jnp.where(inside, out, 0.0))

        combined, rejected = _clip_body(vals, sigma_low, sigma_high,
                                        max_iter)
        out_ref[:] = combined
        rej_ref[:] = rejected

    return kernel


@partial(jax.jit,
         static_argnames=("sigma_low", "sigma_high", "max_iter",
                          "interpret", "block_h", "block_w"))
def shift_clip_fused(stack: jax.Array, dys: jax.Array, dxs: jax.Array,
                     sigma_low: float = 3.0, sigma_high: float = 3.0,
                     max_iter: int = 5, interpret: bool = False,
                     block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Shift each frame by (dys[k], dxs[k]) bicubically, then sigma-clip
    combine. Returns (combined [H, W], rejected scalar i32).

    Offsets are clamped to ±(MAX_SHIFT−3) (integer part).
    """
    n, h, w = stack.shape
    win_h = block_h + _HALO_H
    win_w = block_w + _HALO_W
    dys = jnp.clip(jnp.asarray(dys, jnp.float32), -MAX_SHIFT + 2,
                   MAX_SHIFT - 3)
    dxs = jnp.clip(jnp.asarray(dxs, jnp.float32), -MAX_SHIFT + 2,
                   MAX_SHIFT - 3)
    ky = jnp.floor(dys)
    kx = jnp.floor(dxs)
    shifts = jnp.stack([ky, kx], axis=1).astype(jnp.int32)
    fracs = jnp.stack([dys - ky, dxs - kx], axis=1).astype(jnp.float32)

    # stage 1: integer shift on the HBM side. Edge-replicated padding
    # gives the reference's clamped-tap bicubic semantics; the
    # re-slice leaves 1 row / 1 lane of left halo (tap −1) plus
    # bottom/right margins covering taps +1/+2, the ragged last block
    # and the window overshoot.
    grid = (pl.cdiv(h, block_h), pl.cdiv(w, block_w))
    hp = grid[0] * block_h + _HALO_H
    wp = grid[1] * block_w + _HALO_W
    # bottom/right margins absorb the copy kernel's aligned-window
    # overshoot on its ragged last row-block
    padded = jnp.pad(stack,
                     ((0, 0),
                      (MAX_SHIFT, MAX_SHIFT + win_h + _COPY_RB + 8),
                      (MAX_SHIFT, MAX_SHIFT + win_w + 128)), mode="edge")
    shifted = _preshift_integer(padded, shifts, hp, wp,
                                interpret=interpret)

    kernel = _make_kernel(n, h, w, sigma_low, sigma_high, max_iter,
                          block_h, block_w, grid[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    combined, rejected = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(shifts, fracs, shifted)
    return combined, jnp.sum(rejected)
