"""Rolling-ring one-pass shift + sigma-clip kernel.

Same semantics as stacking/onepass_kernel.py (shift_bicubic +
sigma_clip_core; reference src-tauri/src/core/stacking/combine.rs:14-91,
align.rs:36-57) but with the DMA restructured to kill the window
re-fetch amplification that caps that kernel at ~244 GB/s effective:

- The grid iterates COLUMN-BAND-MAJOR (rows fastest). Within a band,
  frame rows are DMA'd once each in ``block_h``-row chunks into a
  circular VMEM ring ``[n, RING_R, f_c]`` indexed by absolute row mod
  RING_R — consecutive row blocks reuse the ring instead of re-fetching
  the ±off_max envelope and tap margins (the old shared window fetched
  f_r = block_h + 2·off_max + ~10 rows per block: 1.43-1.75× row
  amplification, on top of ~1.7-2× column amplification from 128-lane
  alignment).
- Wider, shorter blocks (16×1152 vs 56×384) stretch the contiguous HBM
  run per DMA row from 2.5 KB to 5.6 KB; rows are fetched once, so the
  row amplification is ~1.0 and the total read amplification drops from
  2.38×/3.5× (off 6/16) to ~1.28×.

Ring schedule (per band, row step t, chunk c covers absolute rows
[c·bh, (c+1)·bh)): compute at t reads chunks [t−BACK, t+FWD]; chunk
t+FWD+1 is issued at t and chunk t+FWD is waited at t (issued at t−1 —
one block of prefetch overlap). RING_R/bh ≥ BACK+FWD+2 guarantees no
live chunk is overwritten. The stack must be padded so the highest
chunk exists: hp ≥ (grid_h + FWD + 1)·bh (``pad_rows_rolling``); the
dispatcher falls back to the shared-window kernel when it is not.

Boundary semantics are reproduced exactly as in the shared-window
kernel: rows before 0 / after h−1 never need fetching — the
edge-replication selects substitute the top/bottom source rows, which
sit at fixed ring positions (0 % RING_R and (h−1) % RING_R) and are
live whenever a block can reference them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from astroburst_tpu.stacking.clip_kernel import _clip_body
from astroburst_tpu.stacking.fused_kernel import _cr_weights

BLOCK_H = 16
BLOCK_W = 1152


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def ring_dims(block_h: int, block_w: int, off_max: int):
    """(RING_R, f_c, BACK, FWD) for the rolling ring."""
    f_c = _ceil_to(2 * off_max + block_w + 130, 128)
    back = -(-(off_max + 1) // block_h)
    fwd = 1 + (off_max + 2) // block_h
    ring_r = (back + fwd + 2) * block_h
    return ring_r, f_c, back, fwd


def pad_rows_rolling(h: int, block_h: int, off_max: int) -> int:
    """Minimum padded row count for the rolling fetch schedule."""
    grid_h = -(-h // block_h)
    _, _, _, fwd = ring_dims(block_h, 1, off_max)
    return _ceil_to((grid_h + fwd + 1) * block_h, 8)


def _make_kernel(n: int, h: int, w: int, hp: int, wp: int,
                 sigma_low: float, sigma_high: float, max_iter: int,
                 block_h: int, block_w: int, grid_h: int, off_max: int,
                 zero_frames: tuple | None = None):
    ring_r, f_c, back, fwd = ring_dims(block_h, block_w, off_max)
    c_max = grid_h - 1 + fwd
    n_sem = fwd + 2

    def kernel(shift_ref, frac_ref, base_ref, stack_hbm, out_ref, rej_ref,
               scratch, sems):
        bj = pl.program_id(0)   # column band (outer)
        t = pl.program_id(1)    # row step (inner)
        row0 = t * block_h
        col0 = bj * block_w
        sc_min_band = col0 - 1 + base_ref[1]
        cx = jnp.clip((sc_min_band // 128) * 128, 0, wp - f_c)
        cx_dma = pl.multiple_of(cx, 128)

        def issue(c):
            # chunk c: abs rows [c*bh, +bh) -> ring rows [c*bh % R, +bh)
            src = pl.multiple_of(c * block_h, 8)
            dst = pl.multiple_of((c * block_h) % ring_r, 8)
            pltpu.make_async_copy(
                stack_hbm.at[:, pl.ds(src, block_h), pl.ds(cx_dma, f_c)],
                scratch.at[:, pl.ds(dst, block_h), :],
                sems.at[c % n_sem]).start()

        @pl.when(t == 0)
        def _init():
            for c0 in range(fwd + 2):
                if c0 <= c_max:
                    issue(jnp.int32(c0))
            for c0 in range(fwd + 1):
                if c0 <= c_max:
                    pltpu.make_async_copy(
                        scratch.at[:, 0:block_h, :],
                        scratch.at[:, 0:block_h, :],
                        sems.at[c0 % n_sem]).wait()

        @pl.when((t > 0) & (t + fwd + 1 <= c_max))
        def _prefetch():
            issue(t + fwd + 1)

        @pl.when(t > 0)
        def _wait():
            pltpu.make_async_copy(
                scratch.at[:, 0:block_h, :],
                scratch.at[:, 0:block_h, :],
                sems.at[(t + fwd) % n_sem]).wait()

        s_r = block_h + 3
        s_c = block_w + 3
        jrow = jax.lax.broadcasted_iota(jnp.int32, (s_r, f_c), 0)
        icol = jax.lax.broadcasted_iota(jnp.int32, (s_r, s_c), 1)
        yy = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      0).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      1).astype(jnp.float32)
        rowf = jnp.float32(0) + row0
        colf = col0.astype(jnp.float32)

        def frame_tile(k, edge_fix: bool):
            sr = row0 - 1 + shift_ref[k, 0]
            sc = col0 - 1 + shift_ref[k, 1]
            t0 = scratch[k]
            # ring row of absolute row r is r % RING_R: align ring row
            # (sr % R) to tile row 0, keep the s_r tap rows
            tr = pltpu.roll(t0, (ring_r - (sr % ring_r)) % ring_r,
                            0)[0:s_r, :]
            if edge_fix:
                # top source row 0 lives at ring row 0, bottom source
                # row h-1 at (h-1) % RING_R — both live whenever a
                # block can clamp to them (top: first steps of the
                # band; bottom: last steps)
                top = t0[0:1, :]
                bot = pltpu.roll(t0,
                                 (ring_r - ((h - 1) % ring_r)) % ring_r,
                                 0)[0:1, :]
                tr2 = jnp.where(jrow + sr < 0, top, tr)
                tr2 = jnp.where(jrow + sr > h - 1, bot, tr2)
            else:
                tr2 = tr
            tc = pltpu.roll(tr2, (f_c - ((sc - cx) % f_c)) % f_c,
                            1)[:, 0:s_c]
            if edge_fix:
                left = tr2[:, 0:1]
                right = pltpu.roll(tr2,
                                   (f_c - ((w - 1 - cx) % f_c)) % f_c,
                                   1)[:, 0:1]
                tc = jnp.where(icol + sc < 0, left, tc)
                tc = jnp.where(icol + sc > w - 1, right, tc)
            return tc

        def body(edge_fix: bool, skip_inside: bool = False):
            vals = []
            for k in range(n):
                tc = frame_tile(k, edge_fix)
                # zero-shift frames return raw pixels (align.rs:37-39);
                # see onepass_kernel for the NaN-parity rationale
                if zero_frames is not None and k in zero_frames:
                    picked = tc[1:1 + block_h, 1:1 + block_w]
                else:
                    wy = _cr_weights(frac_ref[k, 0])
                    wx = _cr_weights(frac_ref[k, 1])
                    tmp = None
                    for j in range(4):
                        term = wy[j] * tc[j:j + block_h, :]
                        tmp = term if tmp is None else tmp + term
                    out = None
                    for j in range(4):
                        term = wx[j] * tmp[:, j:j + block_w]
                        out = term if out is None else out + term
                    zero_k = ((shift_ref[k, 0] == 0) &
                              (shift_ref[k, 1] == 0) &
                              (frac_ref[k, 0] == 0.0) &
                              (frac_ref[k, 1] == 0.0))
                    center = tc[1:1 + block_h, 1:1 + block_w]
                    picked = jnp.where(zero_k, center, out)
                if skip_inside:
                    vals.append(picked)
                    continue
                dy = shift_ref[k, 0].astype(jnp.float32) + frac_ref[k, 0]
                dx = shift_ref[k, 1].astype(jnp.float32) + frac_ref[k, 1]
                sy = yy + rowf + dy
                sx = xx + colf + dx
                inside = ((sy >= -0.5) & (sy <= h - 0.5) &
                          (sx >= -0.5) & (sx <= w - 0.5))
                vals.append(jnp.where(inside, picked, 0.0))

            combined, rejected = _clip_body(vals, sigma_low, sigma_high,
                                            max_iter)
            out_ref[:] = combined
            rej_ref[:] = rejected

        is_interior = ((row0 >= off_max + 1) &
                       (row0 <= h - block_h - off_max - 3) &
                       (col0 >= off_max + 1) &
                       (col0 <= w - block_w - off_max - 3))

        @pl.when(is_interior)
        def _fast():
            body(edge_fix=False, skip_inside=True)

        @pl.when(jnp.logical_not(is_interior))
        def _full():
            body(edge_fix=True)

    return kernel, ring_r, f_c


@partial(jax.jit,
         static_argnames=("h", "w", "sigma_low", "sigma_high", "max_iter",
                          "off_max", "interpret", "block_h", "block_w",
                          "zero_frames"))
def shift_clip_rolling_padded(stack: jax.Array, dys: jax.Array,
                              dxs: jax.Array, h: int, w: int,
                              sigma_low: float, sigma_high: float,
                              max_iter: int, off_max: int,
                              interpret: bool,
                              block_h: int = BLOCK_H,
                              block_w: int = BLOCK_W,
                              zero_frames: tuple | None = None):
    """Rolling-ring combine of a pre-padded stack; the padded rows must
    satisfy ``pad_rows_rolling`` (the dispatcher checks)."""
    n, hp, wp = stack.shape
    grid_h = pl.cdiv(h, block_h)
    grid_w = pl.cdiv(w, block_w)
    ring_r, f_c, _, fwd = ring_dims(block_h, block_w, off_max)
    need_hp = pad_rows_rolling(h, block_h, off_max)
    if hp % 8 or wp % 128 or hp < need_hp or wp < f_c:
        raise ValueError(
            f"rolling kernel needs padded stack >= ({need_hp},{f_c}) "
            f"(8,128)-aligned; got ({hp},{wp})")
    dys = jnp.clip(jnp.asarray(dys, jnp.float32), -off_max, off_max)
    dxs = jnp.clip(jnp.asarray(dxs, jnp.float32), -off_max, off_max)
    dys = jnp.where(jnp.abs(dys) < 1e-12, 0.0, dys)
    dxs = jnp.where(jnp.abs(dxs) < 1e-12, 0.0, dxs)
    ky = jnp.floor(dys)
    kx = jnp.floor(dxs)
    shifts = jnp.stack([ky, kx], axis=1).astype(jnp.int32)
    fracs = jnp.stack([dys - ky, dxs - kx], axis=1).astype(jnp.float32)
    base = jnp.stack([jnp.min(shifts[:, 0]), jnp.min(shifts[:, 1]),
                      jnp.int32(0)])

    kernel, ring_r, f_c = _make_kernel(
        n, h, w, hp, wp, sigma_low, sigma_high, max_iter, block_h,
        block_w, grid_h, off_max, zero_frames=zero_frames)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_w, grid_h),     # rows innermost: the ring rolls down
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda j, i, *_: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda j, i, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, ring_r, f_c), jnp.float32),
            pltpu.SemaphoreType.DMA((fwd + 2,)),
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
    )(shifts, fracs, base, stack)
    return combined, jnp.sum(rejected)
