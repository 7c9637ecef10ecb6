"""Fused per-peak window statistics Pallas kernel.

Star detection (star_detection.rs:86-248) needs, for each candidate
peak, a bounded flood fill over the 41×41 window around it plus the
masked flux/centroid/second moments of the filled component. The XLA
formulation (vmapped ``dynamic_slice`` window gather → [41, 41, K]
flood fill → moment reductions) spends ~13 ms of a ~16 ms detect
program in the gather alone at K=4096 on a 4096² plane: each unaligned
window slice is a tiled-layout relayout, i.e. gather-speed
(CLAUDE.md perf facts), and the windows then make extra HBM round
trips for the fill and the moments.

This kernel does the whole thing in ONE pass at DMA copy speed:

- grid over 8-peak blocks, double-buffered HBM→VMEM DMA of the
  (8, 128)-tile ALIGNED superset block (48×256 for a 41-window)
  around each peak — origins round down to tile alignment, which is
  exactly the Mosaic DMA precondition (ops/crop_kernel.py established
  the pattern);
- in-register ``pltpu.roll`` by the positive residuals puts the true
  window at (0, 0) (negative dynamic roll amounts miscompile — the
  rotate is by the positive complement), a static slice drops to
  [48, 128];
- the bounded flood fill runs as SEPARABLE 3×3 box dilation rounds
  (max over rows then cols — 4 rolls per round instead of 8 neighbor
  shifts) on f32 0/1 masks (no stored i1 vectors on Mosaic), JOINTLY
  over all peaks of the block on one lane-concatenated
  (48, _BLOCK·128) tile with a single fixed-point while_loop — the
  per-peak loop's data-dependent rounds each cost a scalar-core
  branch + pipeline flush, which dominated the kernel (~9.4 ms at
  4096 peaks regardless of live count); cross-segment lane wraps are
  masked exactly like the single-window wraparound (lanes 41..127 of
  every segment are outside the window mask);
- both moment passes (flux/centroid, then central second moments)
  reduce in-register; nine scalars per peak are splatted into one
  (8, 128) accumulator row via lane-iota selects (Mosaic cannot store
  scalars to VMEM, and a (1, 9) output block would violate the
  sublane-divisibility rule) and the whole 8-peak block stores once.

Wraparound safety needs no masking: rows 41..47 and cols 41..127 of
the sliced block are outside the window mask, so their membership is
identically zero and a roll can only wrap zeros in.

Output parity with the XLA path is exact in f32 (same operations,
same reduction shapes per window) and pinned by
tests/test_star_detection.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fetch block for a 41-px window: rows round up to 41+7→48 sublanes,
# cols to 41+127→256 lanes (two tiles; the roll+slice keeps one)
_FETCH_ROWS = 48
_FETCH_COLS = 256
_KEEP_COLS = 128
_BLOCK = 16  # peaks per grid program (fewer program boundaries)
_NSLOT = 4   # DMA ring depth: issue 3 ahead of the wait


def _make_kernel(n_peaks: int, window: int, half: int):
    def kernel(py_ref, px_ref, nv_ref, params_ref, plane_hbm, out_ref,
               scratch, sem):
        i = pl.program_id(0)
        # live-peak prefix: top_k orders finite candidates first, so
        # slots >= nv are -inf/padding — skip their DMA + fill wholesale
        # (a 4096-slot program with ~3000 real peaks wasted ~1.1k
        # issue/wait/fill rounds ≈ 3 ms)
        nv = jnp.minimum(nv_ref[0], n_peaks)

        # whole-program skip: a block whose FIRST peak is dead has no
        # live work at all (live peaks are a prefix) — write the zero
        # rows and return. Per-peak DMA guards alone left phases B/C
        # running for every program, which pinned the kernel at ~9 ms
        # regardless of the live count.
        out_ref[:, :] = jnp.zeros((_BLOCK, 128), jnp.float32)

        @pl.when(i * _BLOCK < nv)
        def _live_body():

            def origin(g):
                # padded-plane coords of the aligned fetch origin; the
                # caller's padding guarantees these are in-range
                y0 = ((py_ref[g] - half) // 8) * 8
                x0 = ((px_ref[g] - half) // 128) * 128
                return pl.multiple_of(y0, 8), pl.multiple_of(x0, 128)

            def dma(slot, g):
                y0, x0 = origin(g)
                return pltpu.make_async_copy(
                    plane_hbm.at[pl.ds(y0, _FETCH_ROWS),
                                 pl.ds(x0, _FETCH_COLS)],
                    scratch.at[slot], sem.at[slot])

            threshold = params_ref[0, 0]
            bg_med = params_ref[0, 1]

            rows_i = jax.lax.broadcasted_iota(jnp.int32,
                                              (_FETCH_ROWS, _KEEP_COLS), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32,
                                              (_FETCH_ROWS, _KEEP_COLS), 1)
            yy = rows_i.astype(jnp.float32)
            xx = cols_i.astype(jnp.float32)
            out_rows = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 128), 0)
            out_cols = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 128), 1)
            acc = jnp.zeros((_BLOCK, 128), jnp.float32)

            @pl.when(i == 0)
            def _():
                # prime the ring: peaks 0.._NSLOT-1 (the loop issues g+_NSLOT
                # at the END of iteration g, after the slot is free)
                for d in range(_NSLOT):
                    @pl.when(jnp.int32(d) < nv)
                    def _(d=d):
                        dma(d, d).start()

            # --- phase A: per-peak DMA wait + alignment rolls; collect the
            # 16 aligned windows side by side along lanes. The per-peak
            # rolls are dynamic (peak-specific residuals) so they cannot be
            # joint, but they are pure VPU data movement — cheap.
            wins = []
            for j in range(_BLOCK):
                g = i * _BLOCK + j
                slot = jax.lax.rem(g, _NSLOT)

                @pl.when(g < nv)
                def _():
                    dma(slot, g).wait()

                y0, x0 = origin(g)
                ry = py_ref[g] - half - y0          # 0..7
                rx = px_ref[g] - half - x0          # 0..127
                block = scratch[slot]
                # rotate the window to (0, 0); shifts stay > 0
                block = pltpu.roll(block, _FETCH_ROWS - ry, 0)
                block = pltpu.roll(block, _FETCH_COLS - rx, 1)
                wins.append(block[:, :_KEEP_COLS])

                # recycle the freed slot for peak g + _NSLOT (ring depth
                # _NSLOT: issued after this peak's reads, 3 peaks ahead of
                # its own wait)
                @pl.when(g + _NSLOT < nv)
                def _():
                    dma(slot, g + _NSLOT).start()

            # --- phase B: ONE joint flood fill over all _BLOCK windows,
            # lane-concatenated to (48, _BLOCK·128). The per-peak
            # while_loop was the kernel's real cost: each data-dependent
            # round is a scalar-core branch + pipeline flush, and 16
            # loops/program × 256 programs held the kernel at ~9.4 ms
            # regardless of peak count. Lane rolls that cross a segment
            # boundary wrap a NEIGHBOR window's edge lane instead of the
            # window's own wrap — both are outside the window mask
            # (wabove == 0 at lanes 41..127 of every segment), so the joint
            # fill is bit-identical to 16 independent fills.
            jw = _BLOCK * _KEEP_COLS
            joint = jnp.concatenate(wins, axis=1)       # (48, jw)
            jrows = jax.lax.broadcasted_iota(jnp.int32, (_FETCH_ROWS, jw), 0)
            jlane = jax.lax.broadcasted_iota(jnp.int32, (_FETCH_ROWS, jw), 1)
            jseg = jlane // _KEEP_COLS                  # peak index j
            jcol = jlane - jseg * _KEEP_COLS            # col within window
            jin_win = (jrows < window) & (jcol < window)
            # dead slots (g >= nv) hold stale scratch; zeroing their lanes
            # makes the fill drop their seed in round 1 and every moment
            # identically 0 — deterministic zero rows, filtered downstream
            jlive = (i * _BLOCK + jseg) < nv
            finite = jnp.isfinite(joint)
            wabove = jnp.where(jin_win & finite & (joint > threshold) & jlive,
                               1.0, 0.0).astype(jnp.float32)
            member0 = jnp.where((jrows == half) & (jcol == half), 1.0,
                                0.0).astype(jnp.float32)

            def grow(member):
                # separable 3×3 box dilation: max over rows, then cols.
                # Wrapped-in values are always masked (outside-window
                # rows/cols have wabove == 0 every round).
                up = pltpu.roll(member, _FETCH_ROWS - 1, 0)
                dn = pltpu.roll(member, 1, 0)
                md = jnp.maximum(member, jnp.maximum(up, dn))
                lf = pltpu.roll(md, jw - 1, 1)
                rt = pltpu.roll(md, 1, 1)
                return jnp.maximum(md, jnp.maximum(lf, rt)) * wabove

            # fixed-point exit: membership grows monotonically per window,
            # so the joint count is monotone and unchanged == all windows
            # converged. TWO dilations per while iteration: the fill is
            # masked and monotone, so grows past the fixed point are the
            # identity and the result is bit-identical — but each
            # while-loop round trip costs a VPU→scalar reduction +
            # branch, and halving the trips measured faster than
            # per-round exits. rnd counts GROWS (steps of 2); worst case
            # needs `half` grows, and rnd < half admits it (overshoot by
            # one grow is identity).
            def fill_cond(c):
                rnd, n_now, n_prev, _ = c
                return (rnd < half) & (n_now != n_prev)

            def fill_body(c):
                rnd, n_now, _, member = c
                member = grow(grow(member))
                return (rnd + 2, jnp.sum(member), n_now, member)

            _, _, _, member = jax.lax.while_loop(
                fill_cond, fill_body,
                (jnp.int32(0), jnp.float32(float(_BLOCK)), jnp.float32(-1.0),
                 member0))

            jv = member * jnp.maximum(
                jnp.where(finite, joint, 0.0) - bg_med, 0.0)

            # --- phase C: per-peak moments on static lane slices of the
            # joint tile (plain VPU reductions, no loops)
            for j in range(_BLOCK):
                sl = slice(j * _KEEP_COLS, (j + 1) * _KEEP_COLS)
                v = jv[:, sl]
                memj = member[:, sl]
                npix = jnp.sum(memj)
                flux = jnp.sum(v)
                safe_flux = jnp.maximum(flux, 1e-30)
                cy = jnp.sum(yy * v) / safe_flux
                cx = jnp.sum(xx * v) / safe_flux
                dy = yy - cy
                dx = xx - cx
                r2m = jnp.sum((dx * dx + dy * dy) * v)
                sxx = jnp.sum(dx * dx * v) / safe_flux
                syy = jnp.sum(dy * dy * v) / safe_flux
                sxy = jnp.sum(dx * dy * v) / safe_flux
                pval = jnp.max(v)

                # splat the nine scalars into lane 0..8 of accumulator
                # row j (Mosaic has no scalar VMEM stores)
                row = jnp.zeros((_BLOCK, 128), jnp.float32)
                for c, val in enumerate((npix, flux, cy, cx, r2m, sxx,
                                         syy, sxy, pval)):
                    row = row + jnp.where(out_cols == c, val, 0.0)
                acc = acc + jnp.where(out_rows == j, row, 0.0)

            out_ref[:, :] = acc

    return kernel


def pad_for_windows(image: jax.Array, window: int = 41):
    """NaN-pad ``image`` so every aligned fetch block of every
    possible peak is in-range: top/left margins are the window half
    rounded up to tile alignment, bottom/right cover the largest
    aligned block, and the total dims are (8, 128)-multiples.

    Returns (padded, top, left) — peak coords translate by (top, left).
    """
    half = window // 2
    rows, cols = image.shape
    top = -(-half // 8) * 8            # 24 for window=41
    left = -(-half // 128) * 128       # 128
    # worst-case fetch end: y0 + FETCH where y0 = ((top + rows - 1 -
    # half) // 8) * 8; pad to tile multiples past it
    bot_need = top + rows - 1 - half + _FETCH_ROWS
    rgt_need = left + cols - 1 - half + _FETCH_COLS
    hp = -(-bot_need // 8) * 8
    wp = -(-rgt_need // 128) * 128
    padded = jnp.pad(image, ((top, hp - top - rows),
                             (left, wp - left - cols)),
                     constant_values=jnp.nan)
    return padded, top, left


@partial(jax.jit, static_argnames=("window", "interpret"))
def window_stats_pallas(padded: jax.Array, pys: jax.Array,
                        pxs: jax.Array, threshold: jax.Array,
                        bg_med: jax.Array, window: int = 41,
                        interpret: bool = False,
                        n_valid: jax.Array | None = None) -> jax.Array:
    """Per-peak window statistics on a :func:`pad_for_windows` plane.

    ``pys``/``pxs`` are int32 peak coords in PADDED coordinates (any
    in-plane value is safe — invalid peaks are filtered downstream).
    ``n_valid`` (traced i32 scalar) marks the live-peak PREFIX length:
    slots >= n_valid skip their DMA and return all-zero rows (the
    caller's peak list comes from a descending top_k, so invalid
    slots are always a suffix). Returns [K, 9] f32 rows: npix, flux,
    cy, cx, r2m, sxx, syy, sxy, pval — window-relative centroids
    (0..window-1), same as the XLA path.
    """
    if window > _KEEP_COLS - 7:
        raise ValueError(f"window {window} exceeds kernel block")
    half = window // 2
    k = pys.shape[0]
    kp = -(-k // _BLOCK) * _BLOCK
    pys = jnp.asarray(pys, jnp.int32)
    pxs = jnp.asarray(pxs, jnp.int32)
    if kp != k:
        # padded slots point at the plane origin (always in-range)
        pys = jnp.concatenate([pys, jnp.full(kp - k, half, jnp.int32)])
        pxs = jnp.concatenate([pxs, jnp.full(kp - k, half, jnp.int32)])
    if n_valid is None:
        n_valid = jnp.int32(k)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    params = jnp.zeros((8, 128), jnp.float32)
    params = params.at[0, 0].set(threshold).at[0, 1].set(bg_med)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // _BLOCK,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 128), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_NSLOT, _FETCH_ROWS, _FETCH_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((_NSLOT,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(kp, window, half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, 128), jnp.float32),
        interpret=interpret,
    )(pys, pxs, nv, params, padded)
    return out[:k, :9]
