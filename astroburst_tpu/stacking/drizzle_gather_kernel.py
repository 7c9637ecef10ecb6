"""Pallas drizzle gather+finalize kernel (parity-decomposed).

The exact drizzle's candidate planes are gathers
``cand[f,ty,tx][o] = frame_f[base_f(o) + t]`` with
``base_f(o) = floor((o - off) / S - d_f) + 1`` (stacking/drizzle.py
``_axis_taps_exact``; reference push-range semantics
src-tauri/src/core/stacking/drizzle.rs:75-78). Materializing them in
HBM for the finalize kernel costs ~2×m×H×W×4 bytes of traffic
(~21 GB at the 10×4096²→2× benchmark — build was 117 ms of the
188 ms total).

For INTEGER scale S the output grid splits by parity o = S·q + p, and
``floor((S·q + c')/S - d) = q + floor(c'/S - d)`` exactly (q is an
integer), so per (frame, output-parity) the gather collapses to a pure
integer SHIFT ``cand[q] = frame[q + s]``. The shifts are computed and
VERIFIED on the host in f32 (stacking/drizzle.py ``_plan_parity``) —
any f32 floor drift at large o falls back to the general path.

This kernel therefore reads the RAW padded stack straight from HBM
(one shared multi-frame DMA per block) and runs the capped push-list
finalize of stacking/drizzle_kernel.py on registers. No candidate
tensor ever exists; HBM traffic drops to the windowed stack read +
the output planes.

Because the block dims (8, 512) are multiples of the (8, 128) tile,
the window residual of every frame is COMPILE-TIME STATIC per
(parity, frame): window start ry(i) = 8·i + ry0 with ry0 =
8·floor(min_f sy_f / 8), so rel_y[f] = sy_f − ry0 never depends on the
grid position. One ``pl.pallas_call`` per parity bakes the shifts in
as constants — no runtime rolls, no scalar tables, every tap a static
(possibly lane-unaligned) slice of the fetched window. A first
variant kept parity as a grid dimension with runtime shift tables and
paid ~8 µs/step in dynamic ``pltpu.roll``s and odd-shaped
intermediates — 203 ms vs the banded path's 186 at the bench config.

Weights stay the exact per-pixel per-axis vectors (w = wy·wx rank-1
per (frame, tap)), parity-sliced on the host and streamed via
BlockSpecs; presence = finite(v) & (w > 1e-12), push order
(frame asc, ty asc, tx asc) — identical semantics to
``_finalize_exact`` / ``_make_finalize_fused_kernel``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from astroburst_tpu.constants import MAD_TO_SIGMA
from astroburst_tpu.stacking.drizzle_kernel import (_bitonic_merge_list,
                                                    _bitonic_sort_list,
                                                    _sort_smallest_p)

BLOCK_H = 8
BLOCK_W = 512


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def window_dims(block_h: int, block_w: int, taps_y: int, taps_x: int,
                span_r: int, span_c: int):
    """Shared DMA window covering every frame's shifted tap reads for
    one output block: block + taps + inter-frame shift span + the
    (8, 128) aligned-floor slack."""
    f_r = _ceil_to(block_h + taps_y - 1 + span_r + 8, 8)
    f_c = _ceil_to(block_w + taps_x - 1 + span_c + 128, 128)
    return f_r, f_c


def _make_kernel(n: int, taps_y: int, taps_x: int, cap: int,
                 sigma_low: float, sigma_high: float, iterations: int,
                 bh: int, bw: int, f_r: int, f_c: int,
                 grid_c: int, n_steps: int, ry0: int, cx0: int,
                 rel_y, rel_x):
    """One parity's kernel. rel_y/rel_x are PYTHON int tuples — every
    tap extraction is a static slice of the fetched window."""
    m = n * taps_y * taps_x
    m2 = 1 << (m - 1).bit_length()
    p = 1 << max(cap - 1, 1).bit_length()
    p = min(p, m2)

    def issue(i, j, stack_hbm, scratch, sems, slot):
        ry = pl.multiple_of(ry0 + i * bh, 8)
        cx = pl.multiple_of(cx0 + j * bw, 128)
        pltpu.make_async_copy(
            stack_hbm.at[:, pl.ds(ry, f_r), pl.ds(cx, f_c)],
            scratch.at[slot], sems.at[slot]).start()

    def kernel(stack_hbm, wy_ref, wx_ref, img_ref, wgt_ref, rej_ref,
               scratch, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        step = i * grid_c + j
        slot = step % 2

        @pl.when(step == 0)
        def _first():
            issue(i, j, stack_hbm, scratch, sems, 0)

        @pl.when(step + 1 < n_steps)
        def _prefetch():
            s1 = step + 1
            issue(s1 // grid_c, s1 % grid_c, stack_hbm, scratch, sems,
                  s1 % 2)

        pltpu.make_async_copy(scratch.at[slot], scratch.at[slot],
                              sems.at[slot]).wait()

        inf = jnp.full((bh, bw), jnp.inf, jnp.float32)
        zero = jnp.zeros((bh, bw), jnp.float32)

        sv = []
        order = jnp.zeros((bh, bw), jnp.int32)
        wgt = zero
        for f in range(n):
            # one STATIC-amount roll per frame axis moves the frame's
            # residual to the window origin; taps are then slices at
            # offsets 0..taps-1 of the full-size rolled tile (cheap
            # constant cross-vreg shifts, no odd-shaped intermediates)
            t0 = scratch[slot, f]
            tr = t0 if rel_y[f] == 0 else \
                pltpu.roll(t0, (f_r - rel_y[f]) % f_r, 0)
            tc = tr if rel_x[f] == 0 else \
                pltpu.roll(tr, (f_c - rel_x[f]) % f_c, 1)
            for ty in range(taps_y):
                wy = wy_ref[:, f * taps_y + ty]        # [bh]
                for tx in range(taps_x):
                    wx = wx_ref[f * taps_x + tx]       # [bw]
                    vk = tc[ty:ty + bh, tx:tx + bw]
                    w = wy[:, None] * wx[None, :]
                    present = jnp.isfinite(vk) & (w > 1e-12)
                    order = order + jnp.where(present, 1, 0)
                    capped = present & (order <= cap)
                    wgt = wgt + jnp.where(capped, w, 0.0)
                    sv.append(jnp.where(capped, vk, inf))
        for _ in range(m2 - m):
            sv.append(inf)

        sv = _sort_smallest_p(sv, p) if p < m2 else _bitonic_sort_list(sv)
        count0 = jnp.minimum(order, cap)

        def rank2(arr, r1, r2, cnt):
            acc = zero
            for j in range(len(arr)):
                acc = acc + jnp.where(r1 == j, arr[j], 0.0) \
                          + jnp.where(r2 == j, arr[j], 0.0)
            return jnp.where(cnt > 0, acc * 0.5, 0.0)

        def clip_iter(_, carry):
            lo, hi, stopped = carry
            cnt = hi - lo
            med = rank2(sv, lo + jnp.maximum((cnt - 1) // 2, 0),
                        lo + jnp.maximum(cnt // 2, 0), cnt)
            dv = []
            for j in range(len(sv)):
                inw = (j >= lo) & (j < hi)
                dv.append(jnp.where(inw, jnp.abs(sv[j] - med), inf))
            dv = _bitonic_merge_list(dv)  # V-shape → one merge
            mad = rank2(dv, jnp.maximum((cnt - 1) // 2, 0),
                        jnp.maximum(cnt // 2, 0), cnt)
            sigma = jnp.maximum(mad * MAD_TO_SIGMA, 1e-10)
            active = (cnt >= 3) & (stopped < 0.5)
            vlo = med - sigma_low * sigma
            vhi = med + sigma_high * sigma
            cut_lo = jnp.zeros((bh, bw), jnp.int32)
            cut_hi = jnp.zeros((bh, bw), jnp.int32)
            for j in range(len(sv)):
                inw = (j >= lo) & (j < hi)
                cut_lo = cut_lo + jnp.where(inw & (sv[j] < vlo), 1, 0)
                cut_hi = cut_hi + jnp.where(inw & (sv[j] > vhi), 1, 0)
            removed = cut_lo + cut_hi
            lo = jnp.where(active, lo + cut_lo, lo)
            hi = jnp.where(active, hi - cut_hi, hi)
            stopped = jnp.where(active & (removed == 0), 1.0, stopped)
            return lo, hi, stopped

        lo, hi, stopped = jax.lax.fori_loop(
            0, iterations, clip_iter,
            (jnp.zeros((bh, bw), jnp.int32), count0, zero))

        final_cnt = hi - lo
        kept_sum = zero
        all_sum = zero
        for j in range(len(sv)):
            kept_sum = kept_sum + jnp.where((j >= lo) & (j < hi),
                                            sv[j], 0.0)
            all_sum = all_sum + jnp.where(j < count0, sv[j], 0.0)
        mean_kept = kept_sum / jnp.maximum(final_cnt.astype(jnp.float32),
                                           1.0)
        mean_all = all_sum / jnp.maximum(count0.astype(jnp.float32), 1.0)
        img_ref[:] = jnp.where(final_cnt > 0, mean_kept,
                               jnp.where(count0 > 0, mean_all, 0.0))
        wgt_ref[:] = wgt
        rej_ref[:] = count0 - final_cnt

    return kernel


@partial(jax.jit,
         static_argnames=("shifts_y", "shifts_x", "n", "taps_y", "taps_x",
                          "cap", "sigma_low", "sigma_high", "iterations",
                          "span_r", "span_c", "h_par", "w_par",
                          "interpret", "block_h", "block_w"))
def drizzle_gather_finalize_parity(stack_padded, wy, wx, shifts_y,
                                   shifts_x, n: int, taps_y: int,
                                   taps_x: int, cap: int,
                                   sigma_low: float, sigma_high: float,
                                   iterations: int, span_r: int,
                                   span_c: int, h_par: int, w_par: int,
                                   interpret: bool = False,
                                   block_h: int = BLOCK_H,
                                   block_w: int = BLOCK_W):
    """ONE parity plane's gather+finalize.

    stack_padded: [n, Hp, Wp] raw frames at the planner's origin — the
        shift tuples already include it.
    wy: [h_pad, n·taps_y] f32 — this parity's row tap weights
        (transposed so the streamed block's minor dim is the full
        array dim, which the Mosaic block constraint allows).
    wx: [n·taps_x, w_pad] f32 — this parity's col tap weights.
    shifts_y, shifts_x: length-n PYTHON int tuples — candidate start
        index of tap 0 for output q = 0, in padded coords. Static:
        they parameterize the compiled kernel.
    span_r/span_c: static bound ≥ max(shift) − min(shift) across the
        frames of any parity (shared across parities so all S² calls
        reuse one window geometry → one Mosaic variant family).

    Returns (img, wgt [h_par, w_par] f32, rej [h_par, w_par] i32).
    """
    _, hp, wp = stack_padded.shape
    f_r, f_c = window_dims(block_h, block_w, taps_y, taps_x,
                           span_r, span_c)
    if hp % 8 or wp % 128 or hp < f_r or wp < f_c:
        raise ValueError(f"padded stack must be (8,128)-aligned and >= "
                         f"window ({f_r},{f_c}); got ({hp},{wp})")
    if h_par % block_h or w_par % block_w:
        raise ValueError(f"parity plane {h_par}x{w_par} not divisible "
                         f"by block ({block_h},{block_w})")
    if block_h % 8 or block_w % 128:
        raise ValueError("block dims must be (8,128)-aligned for the "
                         "static-residual scheme")
    ry0 = 8 * (min(shifts_y) // 8)
    cx0 = 128 * (min(shifts_x) // 128)
    rel_y = tuple(s - ry0 for s in shifts_y)
    rel_x = tuple(s - cx0 for s in shifts_x)
    if max(rel_y) + taps_y - 1 + block_h > f_r:
        raise ValueError("row window too small for shift residuals")
    if max(rel_x) + taps_x - 1 + block_w > f_c:
        raise ValueError("col window too small for shift residuals")
    if ry0 < 0 or cx0 < 0:
        raise ValueError("negative window origin — planner origin must "
                         "cover the most negative shift")
    # the last block's window must stay in bounds WITHOUT clamping
    # (static starts ⇒ no runtime clip)
    if ry0 + (h_par - block_h) + f_r > hp:
        raise ValueError("padded stack too short for the last row block")
    if cx0 + (w_par - block_w) + f_c > wp:
        raise ValueError("padded stack too narrow for the last col block")

    grid = (h_par // block_h, w_par // block_w)
    kernel = _make_kernel(n, taps_y, taps_x, cap, sigma_low, sigma_high,
                          iterations, block_h, block_w, f_r, f_c,
                          grid[1], grid[0] * grid[1], ry0, cx0,
                          rel_y, rel_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((block_h, n * taps_y), lambda i, j: (i, 0)),
            pl.BlockSpec((n * taps_x, block_w), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, f_r, f_c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img, wgt, rej = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h_par, w_par), jnp.float32),
            jax.ShapeDtypeStruct((h_par, w_par), jnp.float32),
            jax.ShapeDtypeStruct((h_par, w_par), jnp.int32),
        ],
        interpret=interpret,
    )(stack_padded, wy, wx)
    return img, wgt, rej
