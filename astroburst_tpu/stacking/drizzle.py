"""Drizzle stacking.

Reference: src-tauri/src/core/stacking/drizzle.rs — per input pixel
forward splat onto output pixels with square (exact overlap area),
Gaussian or Lanczos3 kernels truncated to the pixfrac·scale/2 window;
finalize each output pixel with per-pixel median/MAD sigma clipping of
the contribution list, then the unweighted mean of survivors (weights
map = Σw).

TPU re-formulation (documented delta, SURVEY §7.7): forward splatting
is a scatter, which this backend cannot do efficiently. Because the
frame → output mapping is a uniform scale + per-frame offset and all
three kernels are separable, each frame's contribution field can be
computed *gather-side* as two 1D weighted-tap passes (axis-takes).
Per-frame contributions collapse into their weighted mean
E_f = ΣwV/Σw, and sigma clipping runs across the N per-frame estimates
(the same clip loop as the reference's finalize, with its
even-averaging medians). Same outputs for the common case of one
contribution per frame per output pixel; multi-contribution pixels see
their same-frame values pre-averaged instead of clipped individually.
Out-of-bounds splats are dropped rather than clamped onto border
pixels (a reference border artifact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.alignment.pair import estimate_offset
from astroburst_tpu.alignment.phase_correlation import (is_low_confidence,
                                                        phase_correlate)
from astroburst_tpu.constants import MAD_TO_SIGMA
from astroburst_tpu.ops.sort_network import (bitonic_merge_axis0,
                                             bitonic_sort_axis0,
                                             pad_pow2_inf)
from astroburst_tpu.dtypes import AlignMethod, DrizzleConfig, DrizzleKernel
from astroburst_tpu.errors import InvalidInput
from astroburst_tpu.runtime.progress import ProgressHandle
def _lanczos3(x):
    ax = jnp.abs(x)
    pi_x = jnp.pi * jnp.where(ax < 1e-12, 1.0, x)
    val = (jnp.sin(pi_x) / pi_x) * (jnp.sin(pi_x / 3.0) / (pi_x / 3.0))
    return jnp.where(ax < 1e-12, 1.0, jnp.where(ax >= 3.0, 0.0, val))


def _support_taps(scale: float, half: float, kernel: DrizzleKernel,
                  exact: bool):
    """Minimal tap count covering every input pixel that can contribute
    to one output cell along one axis (the zero-weight-tap pruning of
    VERDICT r2 task 1 — the old symmetric windows carried 5 taps where
    2 suffice, a 6.25× blowup on the candidate axis).

    Geometry: input centers c = (ix + d)·scale are spaced ``scale``
    apart in output coords. For the gather (pre-averaging) form only
    w > 0 matters: square needs overlap of [c−half, c+half] with
    [o, o+1] → c-window width 1 + 2·half; gaussian/lanczos are
    truncated at |o + 0.5 − c| ≤ half + 1 → width 2·half + 2. For the
    exact push-list form the reference pushes over
    floor(c−half) ≤ o ≤ ceil(c+half) (drizzle.rs:75-78) → width
    2 + 2·half — but for SQUARE the w > 1e-12 presence filter already
    drops the zero-overlap pushes, so the tighter w>0 window applies.

    Open-interval windows (square overlap; the exact push range) hold
    at most ``ceil(width)`` integers, all within
    [floor(lower)+1, floor(lower)+ceil(width)] — no margin slot needed
    (the window edges carry only ~zero-weight taps, and f32 jitter of
    the floor can only flip those). The gather gaussian/lanczos
    truncation window is CLOSED, so it keeps a slot at ``floor(lower)``
    for boundary-inclusive edges: floor(width)+2 taps.
    Returns (taps, base_offset) with base = floor(lower)+base_offset."""
    if kernel == DrizzleKernel.SQUARE:
        width = (1.0 + 2.0 * half) / scale
        return max(1, math.ceil(width - 1e-9)), 1
    if exact:
        width = (2.0 + 2.0 * half) / scale
        return max(1, math.ceil(width - 1e-9)), 1
    width = (2.0 * half + 2.0) / scale
    return math.floor(width + 1e-9) + 2, 0


def _axis_weights(n_out: int, n_in: int, d, scale: float, half: float,
                  kernel: DrizzleKernel, taps: int, base_off: int = 0):
    """Per-tap (index [n_out], weight [n_out]) for one axis.

    Input pixel ix has center c = (ix + d)·scale and half-width `half`
    in output coordinates; output pixel o covers [o, o+1). ``taps``
    consecutive input indices from floor(lower) + base_off cover every
    nonzero weight (``_support_taps``).
    """
    o = jnp.arange(n_out, dtype=jnp.float32)
    if kernel == DrizzleKernel.SQUARE:
        lower = (o - half) / scale - d
    else:
        lower = (o + 0.5 - half - 1.0) / scale - d
    base = jnp.floor(lower).astype(jnp.int32) + base_off
    out = []
    for t in range(taps):
        ix = base + t
        inside = (ix >= 0) & (ix <= n_in - 1)
        ixf = ix.astype(jnp.float32)
        c = (ixf + d) * scale
        if kernel == DrizzleKernel.SQUARE:
            w = jnp.maximum(jnp.minimum(c + half, o + 1.0) -
                            jnp.maximum(c - half, o), 0.0)
        elif kernel == DrizzleKernel.GAUSSIAN:
            sigma = max(half, 0.5)
            w = jnp.exp(-((o + 0.5 - c) ** 2) / (2.0 * sigma * sigma))
            w = jnp.where(jnp.abs(o + 0.5 - c) <= half + 1.0, w, 0.0)
        else:  # LANCZOS3
            w = _lanczos3(o + 0.5 - c)
            w = jnp.where(jnp.abs(o + 0.5 - c) <= half + 1.0, w, 0.0)
        w = jnp.where(inside, w, 0.0)
        out.append((jnp.clip(ix, 0, n_in - 1), w))
    return out


def _axis_taps_exact(n_out: int, n_in: int, d, scale: float, half: float,
                     kernel: DrizzleKernel, taps: int, base_off: int):
    """Per-tap (input index [n_out], weight [n_out]) reproducing the
    reference's push set exactly: input pixel ix contributes to output
    cell o iff floor(cx−half) ≤ o ≤ ceil(cx+half) (the scatter loop
    range, drizzle.rs:75-78), with the kernel weight evaluated at the
    cell (w > 1e-12 to count). ``taps`` consecutive indices from
    floor(lower) + base_off cover every push that can pass the 1e-12
    presence filter (``_support_taps``; for SQUARE the
    in-range-but-zero-overlap pushes are never present, so the tighter
    overlap window applies)."""
    o = jnp.arange(n_out, dtype=jnp.float32)
    if kernel == DrizzleKernel.SQUARE:
        lower = (o - half) / scale - d
    else:
        lower = (o - 1.0 - half) / scale - d
    base = jnp.floor(lower).astype(jnp.int32) + base_off
    out = []
    for t in range(taps):
        ix = base + t
        inside = (ix >= 0) & (ix <= n_in - 1)
        ixf = ix.astype(jnp.float32)
        c = (ixf + d) * scale
        in_range = (o >= jnp.floor(c - half)) & (o <= jnp.ceil(c + half))
        if kernel == DrizzleKernel.SQUARE:
            w = jnp.maximum(jnp.minimum(c + half, o + 1.0) -
                            jnp.maximum(c - half, o), 0.0)
        elif kernel == DrizzleKernel.GAUSSIAN:
            sigma = max(half, 0.5)
            w = jnp.exp(-((o + 0.5 - c) ** 2) / (2.0 * sigma * sigma))
        else:  # LANCZOS3
            w = _lanczos3(o + 0.5 - c)
        w = jnp.where(inside & in_range, w, 0.0)
        out.append((jnp.clip(ix, 0, n_in - 1), w))
    return out


def _frame_candidates_raw(frame, d_y, d_x, scale: float, pixfrac: float,
                          kernel: DrizzleKernel, out_rows: int,
                          out_cols: int):
    """RAW gathered candidate planes for one frame (same (y-tap asc,
    x-tap asc) push order as :func:`_frame_candidates`) plus the
    per-axis tap-weight vectors. Values keep their NaN/inf; weights are
    NOT masked by finiteness — the fused Pallas finalize reconstructs
    w = wy·wx and presence = finite & (w > 1e-12) in-register, so the
    [m, H, W] weight tensor never exists in HBM."""
    in_rows, in_cols = frame.shape
    half = pixfrac * scale * 0.5
    taps, base_off = _support_taps(scale, half, kernel, exact=True)
    xt = _axis_taps_exact(out_cols, in_cols, d_x, scale, half, kernel,
                          taps, base_off)
    yt = _axis_taps_exact(out_rows, in_rows, d_y, scale, half, kernel,
                          taps, base_off)
    cand = []
    for idy, _wy in yt:
        rows_v = jnp.take(frame, idy, axis=0)      # [out_rows, in_cols]
        for idx, _wx in xt:
            cand.append(jnp.take(rows_v, idx, axis=1))
    wys = jnp.stack([wy for _, wy in yt])          # [taps, out_rows]
    wxs = jnp.stack([wx for _, wx in xt])          # [taps, out_cols]
    return jnp.stack(cand), wys, wxs, taps


def _frame_candidates(frame, d_y, d_x, scale: float, pixfrac: float,
                      kernel: DrizzleKernel, out_rows: int, out_cols: int):
    """All (value, weight) candidate planes for one frame, ordered
    (input-row tap asc, input-col tap asc) — the reference's per-pixel
    push order within a frame (row scan: iy asc, ix asc)."""
    in_rows, in_cols = frame.shape
    half = pixfrac * scale * 0.5
    taps, base_off = _support_taps(scale, half, kernel, exact=True)
    finite = jnp.isfinite(frame)
    vals = jnp.where(finite, frame, 0.0)
    xt = _axis_taps_exact(out_cols, in_cols, d_x, scale, half, kernel,
                          taps, base_off)
    yt = _axis_taps_exact(out_rows, in_rows, d_y, scale, half, kernel,
                          taps, base_off)
    cand_v, cand_w = [], []
    for idy, wy in yt:
        rows_v = jnp.take(vals, idy, axis=0)       # [out_rows, in_cols]
        rows_f = jnp.take(finite, idy, axis=0)
        for idx, wx in xt:
            v = jnp.take(rows_v, idx, axis=1)      # [out_rows, out_cols]
            f = jnp.take(rows_f, idx, axis=1)
            w = wy[:, None] * wx[None, :]
            cand_v.append(v)
            cand_w.append(jnp.where(f, w, 0.0))
    return jnp.stack(cand_v), jnp.stack(cand_w)


def _finalize_exact(cand_v, cand_w, cap: int, sigma_low, sigma_high,
                    iterations: int):
    """The reference finalize (drizzle.rs:121-195) over the ordered
    candidate axis: cap at max(2·n_frames, 4) in push order, per-pixel
    median/MAD clip of the surviving individual values, unweighted
    mean; empty → mean of ALL capped values; weights map = Σw of the
    capped pushes."""
    present = cand_w > 1e-12
    order_count = jnp.cumsum(present.astype(jnp.int32), axis=0)
    capped = present & (order_count <= cap)
    weight_map = jnp.sum(jnp.where(capped, cand_w, 0.0), axis=0)
    image, rej_map = _clip_mean_frames(
        cand_v.astype(jnp.float32), capped, sigma_low, sigma_high,
        iterations)
    return image, weight_map.astype(jnp.float32), rej_map


@partial(jax.jit,
         static_argnames=("scale", "pixfrac", "kernel", "out_rows",
                          "out_cols", "sigma_low", "sigma_high",
                          "sigma_iterations", "band_rows", "use_pallas",
                          "interpret", "block_h", "block_w"))
def _drizzle_kernel_exact(stack, d_ys, d_xs, scale: float, pixfrac: float,
                          kernel: DrizzleKernel, out_rows: int,
                          out_cols: int, sigma_low: float,
                          sigma_high: float, sigma_iterations: int,
                          band_rows: int = 64,
                          use_pallas: bool | None = None,
                          interpret: bool = False,
                          row0_offset=None,
                          block_h: int | None = None,
                          block_w: int | None = None):
    """Exact-parity drizzle: per-(frame, tap) candidate planes with the
    reference's capped push-list semantics, banded over output rows to
    bound the [n_frames·taps², rows, cols] candidate tensor.

    On TPU the finalize runs as the register-resident Pallas kernel
    (stacking/drizzle_kernel.py — one HBM read of the candidates; the
    XLA network rounds materialize ~50× that in traffic at scale);
    ``use_pallas=False`` keeps the XLA reference path."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = stack.shape[0]
    cap = max(n * 2, 4)
    if use_pallas:
        from astroburst_tpu.stacking.drizzle_kernel import (
            BLOCK_H, drizzle_finalize_fused)
        cols_pad = -(-out_cols // 128) * 128
        if block_w is None:
            block_w = 512 if cols_pad % 512 == 0 else 128
        if block_h is None:
            block_h = BLOCK_H

    def one_band(r0):
        # shift the output grid: band rows [r0, r0+band_rows) are the
        # full drizzle of a vertically offset output; achieved by
        # offsetting d_y in output units: cy' = cy - r0
        if use_pallas:
            parts = [_frame_candidates_raw(
                stack[k], d_ys[k] - r0 / scale, d_xs[k], scale, pixfrac,
                kernel, band_rows, out_cols) for k in range(n)]
            cand_v = jnp.concatenate([p[0] for p in parts], axis=0)
            wys = jnp.concatenate([p[1] for p in parts], axis=0)
            wxs = jnp.concatenate([p[2] for p in parts], axis=0)
            taps = parts[0][3]
            pad = cols_pad - out_cols
            if pad:
                cand_v = jnp.pad(cand_v, ((0, 0), (0, 0), (0, pad)))
                wxs = jnp.pad(wxs, ((0, 0), (0, pad)))  # w=0 → absent
            img, wgt, rej = drizzle_finalize_fused(
                cand_v, wys.T, wxs, n, taps, taps, cap, sigma_low,
                sigma_high, sigma_iterations, interpret=interpret,
                block_h=block_h, block_w=block_w)
            return (img[:, :out_cols], wgt[:, :out_cols],
                    rej[:, :out_cols])
        parts = []
        for k in range(n):
            cv, cw = _frame_candidates(
                stack[k], d_ys[k] - r0 / scale, d_xs[k], scale, pixfrac,
                kernel, band_rows, out_cols)
            parts.append((cv, cw))
        cand_v = jnp.concatenate([p[0] for p in parts], axis=0)
        cand_w = jnp.concatenate([p[1] for p in parts], axis=0)
        return _finalize_exact(cand_v, cand_w, cap, sigma_low, sigma_high,
                               sigma_iterations)

    n_bands = -(-out_rows // band_rows)
    r0s = jnp.arange(n_bands, dtype=jnp.float32) * band_rows
    if row0_offset is not None:
        # row-sharded mode (parallel/drizzle.py): this call computes
        # output rows [row0_offset, row0_offset + out_rows) of the
        # global grid
        r0s = r0s + jnp.asarray(row0_offset, jnp.float32)
    img_b, wgt_b, rej_b = jax.lax.map(one_band, r0s)
    img = img_b.reshape(n_bands * band_rows, out_cols)[:out_rows]
    wgt = wgt_b.reshape(n_bands * band_rows, out_cols)[:out_rows]
    return img, wgt, jnp.sum(rej_b)


def _drizzle_frame(frame, d_y, d_x, scale: float, pixfrac: float,
                   kernel: DrizzleKernel, out_rows: int, out_cols: int):
    """(weighted-sum, weight) fields for one frame, gather-side."""
    in_rows, in_cols = frame.shape
    half = pixfrac * scale * 0.5
    taps, base_off = _support_taps(scale, half, kernel, exact=False)
    finite = jnp.isfinite(frame)
    vals = jnp.where(finite, frame, 0.0)
    ones = finite.astype(jnp.float32)

    xt = _axis_weights(out_cols, in_cols, d_x, scale, half, kernel,
                       taps, base_off)
    yt = _axis_weights(out_rows, in_rows, d_y, scale, half, kernel,
                       taps, base_off)

    # pass 1: along x → [in_rows, out_cols]
    a_val = None
    a_w = None
    for idx, w in xt:
        tv = w[None, :] * jnp.take(vals, idx, axis=1)
        tw = w[None, :] * jnp.take(ones, idx, axis=1)
        a_val = tv if a_val is None else a_val + tv
        a_w = tw if a_w is None else a_w + tw
    # pass 2: along y → [out_rows, out_cols]
    o_val = None
    o_w = None
    for idx, w in yt:
        tv = w[:, None] * jnp.take(a_val, idx, axis=0)
        tw = w[:, None] * jnp.take(a_w, idx, axis=0)
        o_val = tv if o_val is None else o_val + tv
        o_w = tw if o_w is None else o_w + tw
    return o_val, o_w


def _clip_mean_frames(estimates, weights_present, sigma_low, sigma_high,
                      iterations: int):
    """Sigma clip across the candidate axis with the drizzle-finalize
    semantics (drizzle.rs:121-178): even-averaging medians, len<3 stop,
    empty → mean of all.

    Sorted-window formulation: the keep condition is an interval in
    VALUE space (med − σlo·σ ≤ v ≤ med + σhi·σ), so the kept set is
    always contiguous in value-sorted order. One sort up front; each
    iteration then only needs two rank-selects for the median (iota
    compare + sum — no gather), one deviation sort for the MAD, and
    two window-shrink counts. 1 + iterations sorts total instead of
    the naive 2·iterations re-sorts — the sorts are the dominant cost
    of the exact kernel at scale (candidate axis × full output plane).

    Both sorts run as elementwise bitonic networks
    (ops/sort_network.py) rather than XLA's generic sort; the
    per-iteration deviation array ``|sv − med|`` masked to the window
    is V-shaped (each monotone branch extended by +inf), i.e. bitonic,
    so it needs only a log2(m)-round bitonic MERGE, not a full sort.
    """
    mask0 = weights_present
    count0 = jnp.sum(mask0.astype(jnp.int32), axis=0)
    # masked → +inf sorts to the tail; entries [0, count0) are the live
    # candidates in ascending value order (power-of-2 pad joins the
    # +inf tail and is dropped from every rank/count by construction)
    sv = bitonic_sort_axis0(pad_pow2_inf(
        jnp.where(mask0, estimates.astype(jnp.float32), jnp.inf)))
    iota = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 0)

    def rank2(arr, r1, r2, cnt):
        """(arr@r1 + arr@r2)/2 with cnt>0 guard — the even-averaging
        median, via compare+sum instead of per-pixel gathers."""
        p = jnp.sum(jnp.where(iota == r1[None], arr, 0.0), axis=0)
        q = jnp.sum(jnp.where(iota == r2[None], arr, 0.0), axis=0)
        return jnp.where(cnt > 0, (p + q) * 0.5, 0.0)

    lo = jnp.zeros(sv.shape[1:], jnp.int32)
    hi = count0
    stopped = jnp.zeros(sv.shape[1:], bool)
    for _ in range(iterations):
        cnt = hi - lo
        med = rank2(sv, lo + jnp.maximum((cnt - 1) // 2, 0),
                    lo + jnp.maximum(cnt // 2, 0), cnt)
        window = (iota >= lo[None]) & (iota < hi[None])
        # V-shaped in sorted-v order (dec to the median position, inc
        # after, ±inf padding extending both branches) → bitonic, one
        # merge sorts it
        dv = bitonic_merge_axis0(
            jnp.where(window, jnp.abs(sv - med[None]), jnp.inf))
        mad = rank2(dv, jnp.maximum((cnt - 1) // 2, 0),
                    jnp.maximum(cnt // 2, 0), cnt)
        sigma = jnp.maximum(mad * MAD_TO_SIGMA, 1e-10)
        active = (cnt >= 3) & ~stopped
        vlo = med - sigma_low * sigma
        vhi = med + sigma_high * sigma
        cut_lo = jnp.sum((window & (sv < vlo[None])).astype(jnp.int32),
                         axis=0)
        cut_hi = jnp.sum((window & (sv > vhi[None])).astype(jnp.int32),
                         axis=0)
        removed = cut_lo + cut_hi
        lo = jnp.where(active, lo + cut_lo, lo)
        hi = jnp.where(active, hi - cut_hi, hi)
        stopped = stopped | (active & (removed == 0))

    final_cnt = hi - lo
    window = (iota >= lo[None]) & (iota < hi[None])
    mean_kept = jnp.sum(jnp.where(window, sv, 0.0), axis=0) / jnp.maximum(
        final_cnt.astype(jnp.float32), 1.0)
    mean_all = jnp.sum(jnp.where(iota < count0[None], sv, 0.0),
                       axis=0) / jnp.maximum(count0.astype(jnp.float32), 1.0)
    out = jnp.where(final_cnt > 0, mean_kept,
                    jnp.where(count0 > 0, mean_all, 0.0))
    return out, count0 - final_cnt  # (image, per-pixel rejected map)


@partial(jax.jit,
         static_argnames=("scale", "pixfrac", "kernel", "out_rows",
                          "out_cols", "sigma_low", "sigma_high",
                          "sigma_iterations"))
def _drizzle_kernel(stack, d_ys, d_xs, scale: float, pixfrac: float,
                    kernel: DrizzleKernel, out_rows: int, out_cols: int,
                    sigma_low: float, sigma_high: float,
                    sigma_iterations: int):
    def one(frame, dy, dx):
        return _drizzle_frame(frame, dy, dx, scale, pixfrac, kernel,
                              out_rows, out_cols)

    sums, weights = jax.vmap(one)(stack, d_ys, d_xs)
    present = weights > 1e-12
    estimates = jnp.where(present, sums / jnp.where(present, weights, 1.0),
                          0.0)
    image, rej_map = _clip_mean_frames(estimates, present, sigma_low,
                                       sigma_high, sigma_iterations)
    weight_map = jnp.sum(weights, axis=0)
    return image, weight_map, jnp.sum(rej_map)


def _np_lanczos3_f32(x):
    """numpy float32 replication of _lanczos3 (drizzle.rs:207-217)."""
    ax = np.abs(x)
    pi_x = (np.pi * np.where(ax < 1e-12, np.float32(1.0), x)) \
        .astype(np.float32)
    val = ((np.sin(pi_x) / pi_x) *
           (np.sin(pi_x / 3.0) / (pi_x / 3.0))).astype(np.float32)
    return np.where(ax < 1e-12, np.float32(1.0),
                    np.where(ax >= 3.0, np.float32(0.0), val))


def _np_axis_taps_exact(n_out: int, n_in: int, d: float, scale: float,
                        half: float, kernel: DrizzleKernel, taps: int,
                        base_off: int):
    """Host numpy-f32 replication of :func:`_axis_taps_exact` — same
    op order, so add/sub/mul/div/floor/ceil match the traced f32 path
    bitwise (exp/sin may differ by ulps on the gaussian/lanczos
    weights, inside the established oracle tolerances)."""
    o = np.arange(n_out, dtype=np.float32)
    scale32 = np.float32(scale)
    d32 = np.float32(d)
    half32 = np.float32(half)
    if kernel == DrizzleKernel.SQUARE:
        lower = (o - half32) / scale32 - d32
    else:
        lower = (o - np.float32(1.0) - half32) / scale32 - d32
    base = np.floor(lower).astype(np.int32) + base_off
    out = []
    for t in range(taps):
        ix = base + t
        inside = (ix >= 0) & (ix <= n_in - 1)
        ixf = ix.astype(np.float32)
        c = (ixf + d32) * scale32
        in_range = (o >= np.floor(c - half32)) & (o <= np.ceil(c + half32))
        if kernel == DrizzleKernel.SQUARE:
            w = np.maximum(np.minimum(c + half32, o + np.float32(1.0)) -
                           np.maximum(c - half32, o), np.float32(0.0))
        elif kernel == DrizzleKernel.GAUSSIAN:
            sigma = max(half, 0.5)
            w = np.exp(-((o + np.float32(0.5) - c) ** 2) /
                       np.float32(2.0 * sigma * sigma)).astype(np.float32)
        else:  # LANCZOS3
            w = _np_lanczos3_f32(o + np.float32(0.5) - c)
        w = np.where(inside & in_range, w, np.float32(0.0))
        out.append((base + t, w.astype(np.float32)))
    return out


def _plan_parity(in_rows: int, in_cols: int, d_ys, d_xs, scale: float,
                 pixfrac: float, kernel: DrizzleKernel, out_rows: int,
                 out_cols: int):
    """Parity-decomposition plan for the gather+finalize kernel
    (stacking/drizzle_gather_kernel.py), or None when it doesn't apply.

    For INTEGER scale S, output index o = S·q + p gives
    floor((S·q + c')/S − d) = q + floor(c'/S − d) exactly, so each
    per-(frame, tap) candidate gather is a pure shift per parity. The
    identity is VERIFIED here against the f32 per-pixel base vectors
    (the f32 evaluation at large o can drift across binades —
    measured ~8 violations per 144k random configs in round 5); any
    drift → None → the caller keeps the general banded path."""
    s = int(round(scale))
    if abs(scale - s) > 1e-9 or s < 1:
        return None
    if out_rows != in_rows * s or out_cols != in_cols * s:
        return None
    n = len(d_ys)
    half = pixfrac * scale * 0.5
    taps, base_off = _support_taps(scale, half, kernel, exact=True)

    def axis_plan(n_out, n_in, ds):
        """per-frame per-parity shifts + per-parity weight matrices
        [S][n_out//S, n·taps], or None on f32 floor drift."""
        n_par_ax = n_out // s
        q = np.arange(n_par_ax)
        shifts = np.zeros((n, s), np.int64)
        wmats = [np.zeros((n_par_ax, n * taps), np.float32)
                 for _ in range(s)]
        for k, d in enumerate(ds):
            vecs = _np_axis_taps_exact(n_out, n_in, d, scale, half,
                                       kernel, taps, base_off)
            for p in range(s):
                b0 = vecs[0][0][p::s]
                if not np.array_equal(b0, b0[0] + q):
                    return None
                shifts[k, p] = int(b0[0])
                for t in range(taps):
                    wmats[p][:, k * taps + t] = vecs[t][1][p::s]
        return shifts, wmats

    rows = axis_plan(out_rows, in_rows, d_ys)
    if rows is None:
        return None
    cols = axis_plan(out_cols, in_cols, d_xs)
    if cols is None:
        return None
    s_row, wy_mats = rows
    s_col, wx_mats = cols

    span_r = int(max(s_row[:, p].max() - s_row[:, p].min()
                     for p in range(s)))
    span_c = int(max(s_col[:, p].max() - s_col[:, p].min()
                     for p in range(s)))
    span_stat = -(-max(span_r, span_c, 1) // 8) * 8
    if span_stat > 32:
        return None  # pathological offsets — general path
    # static, bucketed origins / bounds so typical offset jitter reuses
    # one compiled variant (pad amounts must be trace-static)
    org_r = -(-max(8, -int(s_row.min())) // 8) * 8
    org_c = -(-max(128, -int(s_col.min())) // 128) * 128
    sy_hi = -(-(org_r + max(0, int(s_row.max()))) // 8) * 8
    sx_hi = -(-(org_c + max(0, int(s_col.max()))) // 128) * 128
    return dict(s=s, taps=taps, s_row=s_row, s_col=s_col,
                wy_mats=wy_mats, wx_mats=wx_mats, span=span_stat,
                org_r=org_r, org_c=org_c, sy_hi=sy_hi, sx_hi=sx_hi,
                h_par=out_rows // s, w_par=out_cols // s)


def _interleave_parity(planes, s: int):
    """[S², h, w] parity planes → [S·h, S·w]: out[S·r + pr, S·c + pc]
    = planes[pr·S + pc][r, c].

    Implemented as axis concats + interleaved index-VECTOR takes: a
    transpose/reshape formulation materializes an [h, S, w, S] temp
    whose minor dim S gets lane-padded to 128 (64× HBM expansion at
    S=2 — measured OOM at the 10×4096²→2× bench shape), while vector
    takes run near memory speed (CLAUDE.md perf notes)."""
    _, h, w = planes.shape
    cidx = (jnp.arange(s * w) % s) * w + (jnp.arange(s * w) // s)
    ridx = (jnp.arange(s * h) % s) * h + (jnp.arange(s * h) // s)
    # column interleave within each row-parity group pr
    cols = jnp.stack([
        jnp.take(jnp.concatenate([planes[pr * s + pc]
                                  for pc in range(s)], axis=1),
                 cidx, axis=1)
        for pr in range(s)])                        # [s, h, s·w]
    # row interleave across groups (reshape of contiguous groups)
    return jnp.take(cols.reshape(s * h, s * w), ridx, axis=0)


@partial(jax.jit,
         static_argnames=("s", "taps", "cap", "sigma_low", "sigma_high",
                          "iterations", "span", "org_r", "org_c", "hp",
                          "wp", "h_par", "w_par", "h_pad", "w_pad",
                          "sy_t", "sx_t", "interpret", "block_h",
                          "block_w"))
def _parity_call(stack, wys, wxs, s: int, taps: int,
                 cap: int, sigma_low: float, sigma_high: float,
                 iterations: int, span: int, org_r: int, org_c: int,
                 hp: int, wp: int, h_par: int, w_par: int, h_pad: int,
                 w_pad: int, sy_t, sx_t, interpret: bool, block_h: int,
                 block_w: int):
    """sy_t/sx_t: [S²][n] nested tuples of PYTHON ints — per-parity
    candidate start shifts, baked into each parity's compiled kernel
    as constants (static residuals ⇒ no runtime rolls)."""
    from astroburst_tpu.stacking.drizzle_gather_kernel import (
        drizzle_gather_finalize_parity)
    n, in_rows, in_cols = stack.shape
    padded = jnp.pad(stack, ((0, 0), (org_r, hp - org_r - in_rows),
                             (org_c, wp - org_c - in_cols)))
    img_l, wgt_l, rej = [], [], jnp.zeros((), jnp.int32)
    for pr in range(s):
        for pc in range(s):
            par = pr * s + pc
            img_p, wgt_p, rej_p = drizzle_gather_finalize_parity(
                padded, wys[pr], wxs[pc], sy_t[par], sx_t[par], n,
                taps, taps, cap, sigma_low, sigma_high, iterations,
                span, span, h_pad, w_pad, interpret=interpret,
                block_h=block_h, block_w=block_w)
            img_l.append(img_p[:h_par, :w_par])
            wgt_l.append(wgt_p[:h_par, :w_par])
            rej = rej + jnp.sum(rej_p)
    img = _interleave_parity(jnp.stack(img_l), s)
    wgt = _interleave_parity(jnp.stack(wgt_l), s)
    return img, wgt, rej


def drizzle_exact_parity(stack, d_ys, d_xs, scale: float, pixfrac: float,
                         kernel: DrizzleKernel, out_rows: int,
                         out_cols: int, sigma_low: float,
                         sigma_high: float, sigma_iterations: int,
                         interpret: bool = False,
                         block_h: int | None = None,
                         block_w: int | None = None):
    """Exact drizzle via the parity-decomposed gather+finalize kernel.

    ``d_ys``/``d_xs`` must be HOST values (the shift plan and its f32
    verification run in numpy). Returns (image, weight_map, rejected)
    or None when the fast path doesn't apply (non-integer scale, f32
    floor drift, offsets beyond the static span bucket)."""
    d_ys = [float(v) for v in np.asarray(d_ys)]
    d_xs = [float(v) for v in np.asarray(d_xs)]
    n, in_rows, in_cols = stack.shape
    plan = _plan_parity(in_rows, in_cols, d_ys, d_xs, scale, pixfrac,
                        kernel, out_rows, out_cols)
    if plan is None:
        return None
    s, taps = plan["s"], plan["taps"]
    if block_h is None:
        block_h = 8
    if block_w is None:
        block_w = 512 if (-(-plan["w_par"] // 128) * 128) % 512 == 0 \
            else 128
    h_pad = -(-plan["h_par"] // block_h) * block_h
    w_pad = -(-plan["w_par"] // block_w) * block_w
    from astroburst_tpu.stacking.drizzle_gather_kernel import window_dims
    f_r, f_c = window_dims(block_h, block_w, taps, taps, plan["span"],
                           plan["span"])
    hp = -(-max(plan["org_r"] + in_rows + taps,
                h_pad - block_h + plan["sy_hi"] + f_r, f_r) // 8) * 8
    wp = -(-max(plan["org_c"] + in_cols + taps,
                w_pad - block_w + plan["sx_hi"] + f_c, f_c) // 128) * 128

    # [S²][n] static shift tuples in padded coords
    sy_t = tuple(tuple(int(v) + plan["org_r"]
                       for v in plan["s_row"][:, pr])
                 for pr in range(s) for _pc in range(s))
    sx_t = tuple(tuple(int(v) + plan["org_c"]
                       for v in plan["s_col"][:, pc])
                 for _pr in range(s) for pc in range(s))
    wys = np.zeros((s, h_pad, n * taps), np.float32)
    wxs = np.zeros((s, n * taps, w_pad), np.float32)
    for p in range(s):
        wys[p, :plan["h_par"]] = plan["wy_mats"][p]
        wxs[p, :, :plan["w_par"]] = plan["wx_mats"][p].T
    cap = max(n * 2, 4)
    img, wgt, rej = _parity_call(
        jnp.asarray(stack), jnp.asarray(wys), jnp.asarray(wxs), s, taps,
        cap, sigma_low, sigma_high, sigma_iterations, plan["span"],
        plan["org_r"], plan["org_c"], hp, wp, plan["h_par"],
        plan["w_par"], h_pad, w_pad, sy_t, sx_t, interpret, block_h,
        block_w)
    return img, wgt, rej


@dataclass
class DrizzleResult:
    image: jax.Array
    weight_map: jax.Array
    frame_count: int
    output_scale: float
    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    offsets: List[Tuple[float, float]]
    rejected_pixels: int


def drizzle_stack(images: Sequence, config: DrizzleConfig = DrizzleConfig(),
                  progress: Optional[ProgressHandle] = None,
                  exact: bool = True) -> DrizzleResult:
    """Full drizzle driver (drizzle.rs:226-346).

    ``exact=True`` (default) uses the capped-candidate-list kernel that
    reproduces the reference's per-contribution clip finalize exactly;
    ``exact=False`` uses the cheaper pre-averaging approximation (one
    estimate per frame per output pixel) — fine when contributions
    rarely overlap (pixfrac·scale ≲ 1), documented delta otherwise."""
    if not images:
        raise InvalidInput("No images to drizzle")
    if len(images) < 2:
        raise InvalidInput(
            "Drizzle requires at least 2 frames for sub-pixel reconstruction")

    dims = [(int(i.shape[0]), int(i.shape[1])) for i in images]
    min_rows = min(d[0] for d in dims)
    min_cols = min(d[1] for d in dims)
    max_rows = max(d[0] for d in dims)
    max_cols = max(d[1] for d in dims)
    tolerance = int(max(min_rows, min_cols) * 0.05)
    if (max_rows - min_rows) > tolerance or (max_cols - min_cols) > tolerance:
        raise InvalidInput(
            f"Frame dimensions vary too much (rows: {max_rows - min_rows}px, "
            f"cols: {max_cols - min_cols}px, tolerance: {tolerance}px)")

    cropped = [jnp.asarray(img)[:min_rows, :min_cols] for img in images]
    scale = min(max(config.scale, 1.0), 4.0)
    pixfrac = min(max(config.pixfrac, 0.1), 1.0)
    out_rows = math.ceil(min_rows * scale)
    out_cols = math.ceil(min_cols * scale)

    reference = cropped[0]
    offsets: List[Tuple[float, float]] = [(0.0, 0.0)]
    if config.align:
        from astroburst_tpu.dtypes import AlignmentMethod
        for i, target in enumerate(cropped[1:], 1):
            if config.alignment_method == AlignmentMethod.PHASE_CORRELATION:
                pc = phase_correlate(reference, target)
                if is_low_confidence(pc.confidence):
                    dy, dx, _ = estimate_offset(reference, target,
                                                AlignMethod.AFFINE)
                    offsets.append((dx, dy))
                else:
                    offsets.append((pc.dx, pc.dy))
            else:  # ZNCC → Affine reroute (drizzle.rs:302-306)
                dy, dx, _ = estimate_offset(reference, target,
                                            AlignMethod.AFFINE)
                offsets.append((dx, dy))
            if progress is not None:
                progress.tick_with_stage(f"align {i}/{len(cropped) - 1}")
                progress.check_cancelled()
    else:
        offsets.extend([(0.0, 0.0)] * (len(cropped) - 1))

    stack = jnp.stack(cropped)
    d_xs = jnp.asarray([-dx for dx, _dy in offsets], jnp.float32)
    d_ys = jnp.asarray([-dy for _dx, dy in offsets], jnp.float32)
    if progress is not None:
        progress.tick_with_stage("drizzling")
    # Auto-route: when no output pixel can receive more than one
    # contribution per frame, the pre-averaging kernel is *identical*
    # to the capped push-list finalize (per-frame pre-average of a
    # single contribution is that contribution; the cap ≥ 2·n never
    # binds at ≤ n candidates; weight maps coincide) and runs without
    # the n·taps² candidate axis. One contribution per axis is
    # guaranteed iff the input-center support window (1 + pixfrac·scale
    # wide, centers spaced `scale` apart) never holds two centers:
    # 1 + pixfrac·scale ≤ scale. SQUARE only — the gaussian/lanczos
    # push range is wider than their weight support, so membership of
    # near-zero-weight pushes differs between the two forms.
    if (exact and config.kernel == DrizzleKernel.SQUARE
            and 1.0 + pixfrac * scale <= scale + 1e-9):
        exact = False
    # NOTE: the parity-decomposed gather+finalize kernel
    # (drizzle_exact_parity) avoids the candidate tensor entirely but
    # measured SLOWER than this banded path on the v5e at the
    # 10×4096²→2× benchmark (229 vs 186 ms — the capped-list clip is
    # VPU-bound either way and the banded candidate build is cheaper
    # than the windowed gather + interleave epilogue). It stays as a
    # tested opt-in; don't auto-route without a new measured win.
    kernel_fn = _drizzle_kernel_exact if exact else _drizzle_kernel
    image, weight_map, rejected = kernel_fn(
        stack, d_ys, d_xs, scale, pixfrac, config.kernel, out_rows,
        out_cols, config.sigma_low, config.sigma_high,
        config.sigma_iterations)
    return DrizzleResult(
        image=image, weight_map=weight_map, frame_count=len(cropped),
        output_scale=scale, input_dims=(min_rows, min_cols),
        output_dims=(out_rows, out_cols), offsets=offsets,
        rejected_pixels=int(rejected))
