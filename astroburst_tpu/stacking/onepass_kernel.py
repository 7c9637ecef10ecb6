"""One-pass fused shift + sigma-clip kernel.

Reads the raw [N, H, W] stack from HBM exactly once and writes the
combined plane — no edge-pad pass, no integer-preshift pass (the two
extra HBM round trips of stacking/fused_kernel.py's two-stage design).

Per grid block it issues ONE multi-frame DMA for a shared aligned
window sized to cover every frame's shift span (static bound
``off_max``), then per frame:

1. two ``pltpu.roll``s align the window to the frame's integer shift
   residual (dynamic roll amounts, always the positive complement —
   negative dynamic rolls miscompile on Mosaic);
2. edge replication (the reference's clamped bicubic taps,
   src-tauri/src/core/imaging/sampling.rs:51-80 ``clamp_index``) is
   reproduced with iota-selects against broadcast edge rows/cols; the
   bottom row / right column of the source are extracted with one more
   roll each (their VMEM position is dynamic);
3. the Catmull-Rom fractional taps run as static slices and the
   per-pixel clip loop (clip_kernel._clip_body) finishes on registers.

Window-coverage construction (rows; cols identical with 128-lane
tiles): per frame k the 4-tap span for a ``block_h``-row output block
starting at ``row0`` is ``[sr_k, sr_k + block_h + 2]`` with
``sr_k = row0 - 1 + ky_k``. With every ``ky`` clamped to ±off_max the
shared span is ≤ 2·off_max + block_h + 3; fetching
``F_r = ceil8(2·off_max + block_h + 10)`` rows from
``clamp(floor8(min_k sr_k), 0, Hp - F_r)`` always covers the clamped
needed range (the fetch start clamp IS the row clamp: rows outside
[0, h) are then reproduced by the selects). The stack must be padded
to Hp = max(ceil8(h), F_r), Wp = max(ceil128(w), F_c) — DMA window
shapes and the clamp bounds must be (8, 128)-tile aligned; padding
content is never read into results.

Semantics identical to shift_bicubic + sigma_clip_core
(reference: src-tauri/src/core/stacking/combine.rs:14-91,
src-tauri/src/core/stacking/align.rs:36-57) for offsets with
|integer part| ≤ off_max; the wrapper clamps offsets into that range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from astroburst_tpu.stacking.clip_kernel import _clip_body
from astroburst_tpu.stacking.fused_kernel import _cr_weights

BLOCK_H = 64
BLOCK_W = 256
OFF_MAX = 16
# one-pass VMEM scratch is 2·N·F_r·F_c·4 bytes; beyond ~20 frames it
# exceeds the ~11 MB cap and the caller should use the two-stage path
MAX_FRAMES = 20


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def window_dims(block_h: int, block_w: int, off_max: int):
    f_r = _ceil_to(2 * off_max + block_h + 10, 8)
    f_c = _ceil_to(2 * off_max + block_w + 130, 128)
    return f_r, f_c


def _make_kernel(n: int, h: int, w: int, hp: int, wp: int,
                 sigma_low: float, sigma_high: float, max_iter: int,
                 block_h: int, block_w: int, grid_w: int, off_max: int,
                 out_off: int = 0, gh: int | None = None,
                 zero_frames: tuple | None = None):
    """out_off/gh support the row-sharded slab mode (parallel/pipeline):
    the stack is a slab of ``h`` rows whose output region starts at slab
    row ``out_off``; the outside-source zero mask uses GLOBAL image
    coords (global height ``gh``, output row offset ``base_ref[2]``).
    Slab halos must be pre-filled (neighbor rows or edge replicas), so
    the kernel's own boundary replication never fires off the slab."""
    f_r, f_c = window_dims(block_h, block_w, off_max)
    if gh is None:
        gh = h

    def window_base(step, base_ref):
        """Aligned, clamped shared-window origin for grid step."""
        row0 = (step // grid_w) * block_h + out_off
        col0 = (step % grid_w) * block_w
        sr_min = row0 - 1 + base_ref[0]
        sc_min = col0 - 1 + base_ref[1]
        ry = jnp.clip((sr_min // 8) * 8, 0, hp - f_r)
        cx = jnp.clip((sc_min // 128) * 128, 0, wp - f_c)
        return pl.multiple_of(ry, 8), pl.multiple_of(cx, 128)

    def issue(step, base_ref, stack_hbm, scratch, sems, slot):
        ry, cx = window_base(step, base_ref)
        pltpu.make_async_copy(
            stack_hbm.at[:, pl.ds(ry, f_r), pl.ds(cx, f_c)],
            scratch.at[slot], sems.at[slot]).start()

    def kernel(shift_ref, frac_ref, base_ref, stack_hbm, out_ref, rej_ref,
               scratch, sems):
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        step = bi * grid_w + bj
        n_steps = pl.num_programs(0) * grid_w
        slot = step % 2
        row0 = bi * block_h + out_off   # slab coords (source/window)
        col0 = bj * block_w

        @pl.when(step == 0)
        def _first():
            issue(0, base_ref, stack_hbm, scratch, sems, 0)

        @pl.when(step + 1 < n_steps)
        def _prefetch():
            issue(step + 1, base_ref, stack_hbm, scratch, sems,
                  (step + 1) % 2)

        ry, cx = window_base(step, base_ref)
        pltpu.make_async_copy(scratch.at[slot], scratch.at[slot],
                              sems.at[slot]).wait()

        s_r = block_h + 3  # rows / cols the taps actually read
        s_c = block_w + 3
        jrow = jax.lax.broadcasted_iota(jnp.int32, (s_r, f_c), 0)
        icol = jax.lax.broadcasted_iota(jnp.int32, (s_r, s_c), 1)
        yy = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      0).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w),
                                      1).astype(jnp.float32)
        # global output coords for the outside-source zero mask
        rowf = (row0 - out_off + base_ref[2]).astype(jnp.float32)
        colf = col0.astype(jnp.float32)

        def frame_tile(k, edge_fix: bool):
            """Frame k's aligned (s_r, s_c) source tile. edge_fix
            replicates the clamped rows/cols (sampling.rs clamp_index);
            interior blocks skip it — see the is_interior bound."""
            sr = row0 - 1 + shift_ref[k, 0]
            sc = col0 - 1 + shift_ref[k, 1]
            t0 = scratch[slot, k]
            # align window row j ↔ source row sr + j, then keep only
            # the s_r rows the taps read — the edge fixes and the lane
            # roll run on the small tile
            tr = pltpu.roll(t0, (f_r - ((sr - ry) % f_r)) % f_r,
                            0)[0:s_r, :]
            if edge_fix:
                # edge replication: source row 0 sits at VMEM row 0
                # whenever sr < 0 (the fetch clamp forces ry = 0);
                # row h-1 / col w-1 via dynamic single-row slices of
                # the unrolled tile (Mosaic has no dynamic_slice on
                # values — extract the dynamic-position edge rows/cols
                # with rolls: sublane roll on the full tile, lane roll
                # on the sliced tile)
                top = t0[0:1, :]
                bot = pltpu.roll(t0, (f_r - ((h - 1 - ry) % f_r)) % f_r,
                                 0)[0:1, :]
                tr2 = jnp.where(jrow + sr < 0, top, tr)
                tr2 = jnp.where(jrow + sr > h - 1, bot, tr2)
            else:
                tr2 = tr
            # columns, on the row-fixed tile (corners replicate both)
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
                # true zero shift returns raw pixels (align.rs:37-39) —
                # the zero-weight taps would otherwise bleed NaN around
                # dead pixels. Frames in the STATIC zero_frames list
                # (the pipeline aligns to frame 0, so k=0 is zero by
                # construction; align=False makes every frame zero)
                # compile the whole CR tap stack away. Every OTHER
                # frame keeps the runtime select: a measured offset can
                # be exactly zero at runtime (duplicate/pre-registered
                # frames), and the reference takes the identity path
                # there — dropping the select for non-listed frames
                # silently re-lost that NaN parity (r3 review).
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
                    out = jnp.where(zero_k, center, out)
                    picked = out
                # outside-source pixels are exactly 0 (align.rs:48-51).
                # Interior blocks in single-device mode skip the mask:
                # row0 ≥ off_max+1 and row0 ≤ h−block_h−off_max−3 with
                # |dy| ≤ off_max (the wrapper clamps) bound sy to
                # [1, h−4] ⊂ (−0.5, gh−0.5) — `inside` is statically
                # true, and the per-frame compare+select chain was
                # ~as much VPU work as the CR taps themselves. Slab
                # mode keeps the mask everywhere: a slab-interior block
                # on the top/bottom device can still be GLOBALLY
                # outside-source.
                if skip_inside:
                    vals.append(picked)
                    continue
                dy = shift_ref[k, 0].astype(jnp.float32) + frac_ref[k, 0]
                dx = shift_ref[k, 1].astype(jnp.float32) + frac_ref[k, 1]
                sy = yy + rowf + dy
                sx = xx + colf + dx
                inside = ((sy >= -0.5) & (sy <= gh - 0.5) &
                          (sx >= -0.5) & (sx <= w - 0.5))
                vals.append(jnp.where(inside, picked, 0.0))

            combined, rejected = _clip_body(vals, sigma_low, sigma_high,
                                            max_iter)
            out_ref[:] = combined
            rej_ref[:] = rejected

        # a block is interior when NO allowed shift (|k| ≤ off_max) can
        # clamp a tap row/col: the edge-replication selects and their
        # two extraction rolls per frame are then dead — ~40% of the
        # per-frame VPU work on ~3/4 of the blocks at bench scale
        is_interior = ((row0 >= off_max + 1) &
                       (row0 <= h - block_h - off_max - 3) &
                       (col0 >= off_max + 1) &
                       (col0 <= w - block_w - off_max - 3))

        @pl.when(is_interior)
        def _fast():
            body(edge_fix=False,
                 skip_inside=(out_off == 0 and gh == h))

        @pl.when(jnp.logical_not(is_interior))
        def _full():
            body(edge_fix=True)

    return kernel


@partial(jax.jit,
         static_argnames=("h", "w", "sigma_low", "sigma_high", "max_iter",
                          "off_max", "interpret", "block_h", "block_w",
                          "out_off", "out_h", "gh", "zero_frames"))
def _shift_clip_onepass_padded(stack: jax.Array, dys: jax.Array,
                               dxs: jax.Array, h: int, w: int,
                               sigma_low: float, sigma_high: float,
                               max_iter: int, off_max: int,
                               interpret: bool, block_h: int,
                               block_w: int, out_off: int = 0,
                               out_h: int | None = None,
                               gh: int | None = None,
                               grow0: jax.Array | None = None,
                               zero_frames: tuple | None = None):
    n, hp, wp = stack.shape
    f_r, f_c = window_dims(block_h, block_w, off_max)
    if hp % 8 or wp % 128 or hp < f_r or wp < f_c:
        raise ValueError(
            f"padded stack must be (8,128)-aligned and >= window "
            f"({f_r},{f_c}); got ({hp},{wp})")
    if out_h is None:
        out_h = h
    dys = jnp.clip(jnp.asarray(dys, jnp.float32), -off_max, off_max)
    dxs = jnp.clip(jnp.asarray(dxs, jnp.float32), -off_max, off_max)
    # snap sub-1e-12 offsets to exact zero so the kernel's raw-pixel
    # fast path triggers exactly where the reference skips the shift
    dys = jnp.where(jnp.abs(dys) < 1e-12, 0.0, dys)
    dxs = jnp.where(jnp.abs(dxs) < 1e-12, 0.0, dxs)
    ky = jnp.floor(dys)
    kx = jnp.floor(dxs)
    shifts = jnp.stack([ky, kx], axis=1).astype(jnp.int32)
    fracs = jnp.stack([dys - ky, dxs - kx], axis=1).astype(jnp.float32)
    if grow0 is None:
        grow0 = jnp.int32(0)
    base = jnp.stack([jnp.min(shifts[:, 0]), jnp.min(shifts[:, 1]),
                      jnp.asarray(grow0, jnp.int32)])

    grid = (pl.cdiv(out_h, block_h), pl.cdiv(w, block_w))
    kernel = _make_kernel(n, h, w, hp, wp, sigma_low, sigma_high,
                          max_iter, block_h, block_w, grid[1], off_max,
                          out_off=out_off, gh=gh, zero_frames=zero_frames)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, f_r, f_c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    combined, rejected = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_h, w), jnp.float32),
            jax.ShapeDtypeStruct((out_h, w), jnp.int32),
        ],
        interpret=interpret,
    )(shifts, fracs, base, stack)
    return combined, jnp.sum(rejected)


def pad_stack_aligned(stack: jax.Array, block_h: int = BLOCK_H,
                      block_w: int = BLOCK_W,
                      off_max: int = OFF_MAX) -> jax.Array:
    """Pad [N, H, W] to the aligned layout the one-pass kernel reads.

    Do this once at ingest (host-side it is free during H2D); the
    padding content is never read into results. The row pad includes
    the rolling-ring kernel's fetch-schedule margin (~1% extra rows,
    stacking/rolling_kernel.py) so the dispatcher can take that path.
    """
    from astroburst_tpu.stacking.rolling_kernel import (
        BLOCK_H as RBH, pad_rows_rolling)
    n, h, w = stack.shape
    f_r, f_c = window_dims(block_h, block_w, off_max)
    hp = max(_ceil_to(h, 8), f_r,
             pad_rows_rolling(h, RBH, off_max),
             pad_rows_rolling(h, RBH, ADAPTIVE_OFF))
    wp = max(_ceil_to(w, 128), f_c)
    if (hp, wp) == (h, w):
        return stack
    return jnp.pad(stack, ((0, 0), (0, hp - h), (0, wp - w)))


# Small-envelope variant bound (see shift_clip_onepass). Keep at 6:
# a 10-px envelope variant measured ~6 s/call at 10×4096² (260× the
# 6-px variant; same F_c, nearly the same F_r — Mosaic pathology, not
# traffic) in round 4. Don't raise without re-measuring that shape.
ADAPTIVE_OFF = 6
# Wider, shorter blocks for the small-envelope variant: at off_max=6 a
# 56×384 block fetches (80, 640) — DMA amplification 2.38× vs 2.75×
# and 606 blocks instead of 801 at 5655×2206 (fewer per-block dynamic
# rolls). Measured 12.44 vs 13.39 ms for the bench stack stage,
# bit-exact. 64×384 OOMs scoped VMEM by 36 KB (16.04M vs 16.00M);
# 56 rows frees 0.65 MB of ring scratch. The off_max=16 fallback
# keeps 64×256 — its (112, 640) window OOMs at 64×384.
ADAPTIVE_BLOCK_H = 56
ADAPTIVE_BLOCK_W = 384


@partial(jax.jit,
         static_argnames=("h", "w", "sigma_low", "sigma_high", "max_iter",
                          "off_max", "interpret", "block_h", "block_w",
                          "zero_frames", "adaptive_ok", "rolling_ok"))
def _onepass_dispatch(stack: jax.Array, dys: jax.Array, dxs: jax.Array,
                      h: int, w: int, sigma_low: float, sigma_high: float,
                      max_iter: int, off_max: int, interpret: bool,
                      block_h: int, block_w: int,
                      zero_frames: tuple | None, adaptive_ok: bool,
                      rolling_ok: bool = False):
    """Module-level jit around the adaptive ``lax.cond`` dispatch.

    MUST stay a cached top-level jit: an eager caller that rebuilt
    this cond per call re-traced a fresh program each time, and the
    remote-compile hop turned a 17 ms stack into ~10.5 s/call
    (round-4 bench regression). Under an outer jit it inlines.

    ``rolling_ok`` routes to the rolling-ring kernel
    (stacking/rolling_kernel.py — read amplification ~1.28x vs
    2.38x/3.5x) when the caller's pad satisfies its fetch schedule."""
    if rolling_ok:
        from astroburst_tpu.stacking.rolling_kernel import (
            shift_clip_rolling_padded)
        run_roll = partial(shift_clip_rolling_padded, h=h, w=w,
                           sigma_low=sigma_low, sigma_high=sigma_high,
                           max_iter=max_iter, interpret=interpret,
                           zero_frames=zero_frames)
        if adaptive_ok:
            small = (jnp.max(jnp.maximum(jnp.abs(dys), jnp.abs(dxs)))
                     <= float(ADAPTIVE_OFF))
            return jax.lax.cond(
                small,
                lambda s, a, b: run_roll(s, a, b, off_max=ADAPTIVE_OFF),
                lambda s, a, b: run_roll(s, a, b, off_max=off_max),
                stack, dys, dxs)
        return run_roll(stack, dys, dxs, off_max=off_max)
    run = partial(_shift_clip_onepass_padded, h=h, w=w,
                  sigma_low=sigma_low, sigma_high=sigma_high,
                  max_iter=max_iter, interpret=interpret,
                  block_h=block_h, block_w=block_w,
                  zero_frames=zero_frames)
    if adaptive_ok:
        # the small branch also widens the block when (a) the caller
        # uses the default block and (b) the padded dims admit the
        # (80, 640) fetch window — tests on small planes fall back
        hp, wp = stack.shape[1], stack.shape[2]
        fr6, fc6 = window_dims(ADAPTIVE_BLOCK_H, ADAPTIVE_BLOCK_W,
                               ADAPTIVE_OFF)
        if ((block_h, block_w) == (BLOCK_H, BLOCK_W)
                and hp >= fr6 and wp >= fc6):
            bh6, bw6 = ADAPTIVE_BLOCK_H, ADAPTIVE_BLOCK_W
        else:
            bh6, bw6 = block_h, block_w
        small = (jnp.max(jnp.maximum(jnp.abs(dys), jnp.abs(dxs)))
                 <= float(ADAPTIVE_OFF))
        return jax.lax.cond(
            small,
            lambda s, a, b: run(s, a, b, off_max=ADAPTIVE_OFF,
                                block_h=bh6, block_w=bw6),
            lambda s, a, b: run(s, a, b, off_max=off_max),
            stack, dys, dxs)
    return run(stack, dys, dxs, off_max=off_max)


def shift_clip_onepass(stack: jax.Array, dys: jax.Array, dxs: jax.Array,
                       sigma_low: float = 3.0, sigma_high: float = 3.0,
                       max_iter: int = 5, off_max: int = OFF_MAX,
                       true_shape: tuple | None = None,
                       interpret: bool = False, block_h: int = BLOCK_H,
                       block_w: int = BLOCK_W,
                       zero_frames: tuple | None = None,
                       adaptive: bool = True, rolling: bool = False):
    """Shift each frame by (dys[k], dxs[k]) bicubically, then sigma-clip
    combine, in ONE pass over the stack. Returns (combined [h, w],
    rejected scalar i32).

    Offsets are clamped to ±off_max. ``true_shape=(h, w)`` marks
    ``stack`` as already padded by :func:`pad_stack_aligned`; otherwise
    the stack is padded here (one extra XLA copy — pre-pad at ingest
    to avoid it).

    ``adaptive``: the shared DMA window must cover every frame's shift
    span, so its area (the kernel's HBM amplification — 3.5× at
    off_max=16) scales with the STATIC envelope, not the actual
    offsets. When every |offset| ≤ ADAPTIVE_OFF a ``lax.cond`` takes a
    second compiled variant whose window is sized for that envelope
    (amplification 2.75×) — exact in both branches (the clamp is
    inactive on the small branch by construction). Typical guided
    dithers are 1-5 px; production callers with larger dithers pay the
    wide window only when their data actually needs it.
    """
    if true_shape is not None:
        h, w = true_shape
    else:
        _, h, w = stack.shape
        stack = pad_stack_aligned(stack, block_h, block_w, off_max)
    hp, wp = stack.shape[1], stack.shape[2]
    # shrink blocks for small planes so the window fits inside the pad
    while block_h > 8 and window_dims(block_h, block_w, off_max)[0] > hp:
        block_h //= 2
    while block_w > 128 and window_dims(block_h, block_w, off_max)[1] > wp:
        block_w //= 2
    dys = jnp.asarray(dys, jnp.float32)
    dxs = jnp.asarray(dxs, jnp.float32)
    adaptive_ok = bool(
        adaptive and off_max > ADAPTIVE_OFF
        and window_dims(block_h, block_w, ADAPTIVE_OFF)[0] <= hp
        and window_dims(block_h, block_w, ADAPTIVE_OFF)[1] <= wp)
    # rolling-ring path (stacking/rolling_kernel.py): cuts HBM read
    # amplification 2.38x -> ~1.28x but the full-ring extraction rolls
    # cost MORE VPU than the DMA saved — measured 13.17 vs 11.83 ms at
    # the bench stack (the kernel is roll/VPU-bound, not DMA-bound).
    # Opt-in only; needs the bigger row pad and a wide column pad.
    from astroburst_tpu.stacking import rolling_kernel as RK
    offs = {off_max} | ({ADAPTIVE_OFF} if adaptive_ok else set())
    rolling_ok = bool(
        rolling
        and (block_h, block_w) == (BLOCK_H, BLOCK_W)
        and stack.shape[0] <= MAX_FRAMES
        and all(hp >= RK.pad_rows_rolling(h, RK.BLOCK_H, o)
                and wp >= RK.ring_dims(RK.BLOCK_H, RK.BLOCK_W, o)[1]
                for o in offs))
    return _onepass_dispatch(stack, dys, dxs, h, w, sigma_low, sigma_high,
                             max_iter, off_max, interpret, block_h,
                             block_w, zero_frames, adaptive_ok,
                             rolling_ok)


def shift_clip_onepass_slab(slab: jax.Array, dys: jax.Array,
                            dxs: jax.Array, halo: int, grow0: jax.Array,
                            gh: int, sigma_low: float = 3.0,
                            sigma_high: float = 3.0, max_iter: int = 5,
                            off_max: int = OFF_MAX,
                            interpret: bool = False,
                            block_h: int = BLOCK_H,
                            block_w: int = BLOCK_W,
                            zero_frames: tuple | None = None):
    """Row-sharded slab variant for use inside ``shard_map``.

    ``slab`` is [N, local_h + 2·halo, W]: the shard's output rows plus
    ``halo`` pre-filled rows above and below (neighbor rows via
    ppermute; edge replicas of the global first/last row at the global
    boundaries). ``halo`` must be >= off_max + 2 so neither the bicubic
    taps nor the kernel's boundary replication reach off the slab.
    ``grow0`` is the shard's first output row in GLOBAL coords (traced
    i32), ``gh`` the global image height — the outside-source zero mask
    (align.rs:48-51) is evaluated globally. Returns
    (combined [local_h, W], rejected scalar i32).
    """
    if halo < off_max + 2:
        raise ValueError(f"halo must be >= off_max + 2 = {off_max + 2}")
    n, slab_h, w = slab.shape
    out_h = slab_h - 2 * halo
    padded = pad_stack_aligned(slab, block_h, block_w, off_max)
    hp, wp = padded.shape[1], padded.shape[2]
    while block_h > 8 and window_dims(block_h, block_w, off_max)[0] > hp:
        block_h //= 2
    while block_w > 128 and window_dims(block_h, block_w, off_max)[1] > wp:
        block_w //= 2
    return _shift_clip_onepass_padded(
        padded, dys, dxs, slab_h, w, sigma_low, sigma_high, max_iter,
        off_max, interpret, block_h, block_w, out_off=halo, out_h=out_h,
        gh=gh, grow0=grow0, zero_frames=zero_frames)
