"""Fused Pallas shift + sigma-clip kernel.

The stacking hot loop is: bicubic-shift every frame by its alignment
offset, then per-pixel sigma-clip across frames. Done separately that
costs ~3 full HBM round-trips of the [N, H, W] stack. This kernel does
both in one pass: for each output block it DMAs the per-frame shifted
source windows out of an edge-replicated padded stack, applies the
per-frame fractional 4×4 Catmull-Rom taps in VMEM, and runs the full
clip loop (clip_kernel._clip_body) on the shifted register tiles.

DMA source starts must be (8, 128)-tile aligned, so each window is
fetched from the aligned floor of its start and the sub-tile residual
is fixed up in VMEM with dynamic rotates before the static tap slices.

HBM traffic: one read of the padded stack + one [H, W] write — against
~6 GB of reads/writes for the unfused path at 16×5655×2206.

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
BLOCK_W = 256
# windows add the 4-tap halo (3) + the sub-tile DMA residual
# (<8 sublanes / <128 lanes), rounded up to the (8, 128) tile
_HALO_H = 16
_HALO_W = 256


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


def _make_kernel(n: int, h: int, w: int, sigma_low: float,
                 sigma_high: float, max_iter: int, block_h: int,
                 block_w: int, grid_w: int):
    win_h = block_h + _HALO_H
    win_w = block_w + _HALO_W

    def issue_dmas(step, shift_ref, stack_hbm, scratch, sems, slot):
        """Start the n window DMAs for grid step `step` into buffer
        `slot`; returns the per-frame sub-tile residuals."""
        row0 = (step // grid_w) * block_h
        col0 = (step % grid_w) * block_w
        starts = []
        for k in range(n):
            base_r = row0 + shift_ref[k, 0] + MAX_SHIFT - 1
            base_c = col0 + shift_ref[k, 1] + MAX_SHIFT - 1
            ry = pl.multiple_of((base_r // 8) * 8, 8)
            cx = pl.multiple_of((base_c // 128) * 128, 128)
            starts.append((base_r - ry, base_c - cx))
            pltpu.make_async_copy(
                stack_hbm.at[k, pl.ds(ry, win_h), pl.ds(cx, win_w)],
                scratch.at[slot, k], sems.at[slot, k]).start()
        return starts

    def kernel(shift_ref, frac_ref, stack_hbm, out_ref, rej_ref, scratch,
               sems):
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        step = bi * grid_w + bj
        n_steps = pl.num_programs(0) * grid_w
        slot = step % 2
        row0 = bi * block_h
        col0 = bj * block_w

        # double buffering: step 0 issues its own DMAs; every step
        # issues the NEXT step's DMAs before computing, so the copies
        # overlap the clip loop
        @pl.when(step == 0)
        def _first():
            issue_dmas(0, shift_ref, stack_hbm, scratch, sems, 0)

        # residuals are recomputed (cheap scalar math) rather than
        # carried across grid steps
        starts = []
        for k in range(n):
            base_r = row0 + shift_ref[k, 0] + MAX_SHIFT - 1
            base_c = col0 + shift_ref[k, 1] + MAX_SHIFT - 1
            starts.append((base_r - (base_r // 8) * 8,
                           base_c - (base_c // 128) * 128))

        @pl.when(step + 1 < n_steps)
        def _prefetch():
            issue_dmas(step + 1, shift_ref, stack_hbm, scratch, sems,
                       (step + 1) % 2)

        yy = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      0).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      1).astype(jnp.float32)
        rowf = row0.astype(jnp.float32)
        colf = col0.astype(jnp.float32)

        vals = []
        for k in range(n):
            pltpu.make_async_copy(scratch.at[slot, k], scratch.at[slot, k],
                                  sems.at[slot, k]).wait()
            r_off, c_off = starts[k]
            wy = _cr_weights(frac_ref[k, 0])
            wx = _cr_weights(frac_ref[k, 1])
            # rotate the residual away so the taps are static slices;
            # negative dynamic rotates miscompile on this backend, so
            # rotate by the positive complement instead
            tile = pltpu.roll(scratch[slot, k], (win_h - r_off) % win_h, 0)
            tmp = None
            for j in range(4):
                term = wy[j] * tile[j:j + block_h, :]
                tmp = term if tmp is None else tmp + term
            tmp = pltpu.roll(tmp, (win_w - c_off) % win_w, 1)
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

    # edge-replicated padding gives the reference's clamped-tap bicubic
    # semantics; bottom/right margins also cover the ragged last block
    # and the aligned-window overshoot
    padded = jnp.pad(stack, ((0, 0), (MAX_SHIFT, MAX_SHIFT + win_h),
                             (MAX_SHIFT, MAX_SHIFT + win_w)), mode="edge")

    grid = (pl.cdiv(h, block_h), pl.cdiv(w, block_w))
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
            pltpu.SemaphoreType.DMA((2, n)),
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
    )(shifts, fracs, padded)
    return combined, jnp.sum(rejected)
