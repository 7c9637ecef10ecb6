"""Pallas drizzle-finalize kernel.

The exact drizzle's per-pixel finalize (capped push list → iterative
median/MAD sigma clip → mean of survivors; drizzle.rs:121-195) runs a
value sort plus one V-shape merge per clip iteration over the
``m ≈ 40``-deep candidate axis. Expressed in XLA the bitonic network
rounds materialize in HBM at large widths (measured 6.99 s of a 7.4 s
10×4096² drizzle — ~50× the candidates' own footprint in traffic).

This kernel reads the [m, H, W] candidate tensors from HBM exactly
once per block and runs the ENTIRE finalize on registers: the
candidate axis becomes a Python list of [bh, bw] tiles, so every
compare-exchange of the bitonic sort, every rank select, and every
window count is a static VPU op with no intermediate writes. Per-pixel
dynamic state (window bounds, medians, stop flags) lives in i32/f32
planes — no stored i1 vectors (Mosaic restriction).

Semantics identical to stacking.drizzle._finalize_exact (which remains
as the XLA reference path and the interpret-mode oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from astroburst_tpu.constants import MAD_TO_SIGMA

BLOCK_H = 8
BLOCK_W = 512


def _bitonic_sort_list(vals):
    """Full ascending bitonic sort of a Python list of equal-shape
    tiles (length must be a power of two). Static network — every
    compare-exchange is a pairwise min/max."""
    m = len(vals)
    assert m & (m - 1) == 0
    k = m.bit_length() - 1
    v = list(vals)
    for stage in range(1, k + 1):
        block = 1 << stage
        for s in reversed(range(stage)):
            stride = 1 << s
            for i in range(m):
                j = i ^ stride
                if j <= i:
                    continue
                ascending = (i // block) % 2 == 0
                lo = jnp.minimum(v[i], v[j])
                hi = jnp.maximum(v[i], v[j])
                v[i], v[j] = (lo, hi) if ascending else (hi, lo)
    return v


def _bitonic_merge_list(vals):
    """Ascending sort of a BITONIC list (V-shapes qualify) in log2(m)
    rounds."""
    m = len(vals)
    assert m & (m - 1) == 0
    v = list(vals)
    stride = m // 2
    while stride >= 1:
        for i in range(m):
            j = i ^ stride
            if j <= i:
                continue
            lo = jnp.minimum(v[i], v[j])
            hi = jnp.maximum(v[i], v[j])
            v[i], v[j] = lo, hi
        stride //= 2
    return v


def _make_finalize_kernel(m: int, cap: int, sigma_low: float,
                          sigma_high: float, iterations: int,
                          bh: int, bw: int):
    m2 = 1 << (m - 1).bit_length()

    def kernel(v_ref, w_ref, img_ref, wgt_ref, rej_ref):
        inf = jnp.full((bh, bw), jnp.inf, jnp.float32)
        zero = jnp.zeros((bh, bw), jnp.float32)

        # presence + push-order cap + weight map, in push order
        sv = []
        order = jnp.zeros((bh, bw), jnp.int32)
        wgt = zero
        for k in range(m):
            vk = v_ref[k]
            wk = w_ref[k]
            present = wk > 1e-12
            order = order + jnp.where(present, 1, 0)
            capped = present & (order <= cap)
            wgt = wgt + jnp.where(capped, wk, 0.0)
            sv.append(jnp.where(capped, vk, inf))
        for _ in range(m2 - m):
            sv.append(inf)

        sv = _bitonic_sort_list(sv)
        count0 = jnp.minimum(order, cap)

        def rank2(arr, r1, r2, cnt):
            acc = zero
            for k in range(len(arr)):
                acc = acc + jnp.where(r1 == k, arr[k], 0.0) \
                          + jnp.where(r2 == k, arr[k], 0.0)
            return jnp.where(cnt > 0, acc * 0.5, 0.0)

        # clip iterations as a fori_loop over the (lo, hi, stopped)
        # carry — the sorted sv tiles are loop closure constants, so
        # the ~900-op body is emitted ONCE instead of ×iterations
        # (the fully unrolled form was a ~15k-op Mosaic function whose
        # remote compile never returned)
        def clip_iter(_, carry):
            lo, hi, stopped = carry
            cnt = hi - lo
            med = rank2(sv, lo + jnp.maximum((cnt - 1) // 2, 0),
                        lo + jnp.maximum(cnt // 2, 0), cnt)
            dv = []
            for k in range(m2):
                inw = (k >= lo) & (k < hi)
                dv.append(jnp.where(inw, jnp.abs(sv[k] - med), inf))
            dv = _bitonic_merge_list(dv)  # V-shape → one merge
            mad = rank2(dv, jnp.maximum((cnt - 1) // 2, 0),
                        jnp.maximum(cnt // 2, 0), cnt)
            sigma = jnp.maximum(mad * MAD_TO_SIGMA, 1e-10)
            active = (cnt >= 3) & (stopped < 0.5)
            vlo = med - sigma_low * sigma
            vhi = med + sigma_high * sigma
            cut_lo = jnp.zeros((bh, bw), jnp.int32)
            cut_hi = jnp.zeros((bh, bw), jnp.int32)
            for k in range(m2):
                inw = (k >= lo) & (k < hi)
                cut_lo = cut_lo + jnp.where(inw & (sv[k] < vlo), 1, 0)
                cut_hi = cut_hi + jnp.where(inw & (sv[k] > vhi), 1, 0)
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
        for k in range(m2):
            kept_sum = kept_sum + jnp.where((k >= lo) & (k < hi),
                                            sv[k], 0.0)
            all_sum = all_sum + jnp.where(k < count0, sv[k], 0.0)
        mean_kept = kept_sum / jnp.maximum(final_cnt.astype(jnp.float32),
                                           1.0)
        mean_all = all_sum / jnp.maximum(count0.astype(jnp.float32), 1.0)
        img_ref[:] = jnp.where(final_cnt > 0, mean_kept,
                               jnp.where(count0 > 0, mean_all, 0.0))
        wgt_ref[:] = wgt
        rej_ref[:] = count0 - final_cnt

    return kernel


def _sort_smallest_p(sv, p: int):
    """Ascending order of the smallest ``p`` elements of the tile list
    ``sv`` (len must be a multiple of p, each a power of two), given
    that at most p of them are non-inf: sort p-sized chunks, then fold
    with the classic bitonic smallest-p extraction — elementwise
    min(asc_keep[i], desc_chunk[i]) is the smallest-p multiset and is
    bitonic, so one merge re-sorts it. ~45% fewer compare-exchanges
    than one full sort at len=64, p=32, and every later stage (rank
    selects, window counts, V-merges) shrinks to p tiles."""
    chunks = [_bitonic_sort_list(sv[i:i + p]) for i in range(0, len(sv), p)]
    keep = chunks[0]
    for c in chunks[1:]:
        keep = _bitonic_merge_list(
            [jnp.minimum(keep[i], c[p - 1 - i]) for i in range(p)])
    return keep


def _make_finalize_fused_kernel(n: int, taps_y: int, taps_x: int, cap: int,
                                sigma_low: float, sigma_high: float,
                                iterations: int, bh: int, bw: int):
    """Finalize kernel that reads only the RAW gathered value planes
    from HBM and reconstructs each candidate's weight in-register from
    the per-axis tap-weight vectors (w = wy·wx is rank-1 per
    (frame, tap) — materializing [m, H, W] weights in HBM was half the
    kernel's traffic). Presence = finite(value) & (w > 1e-12), exactly
    the XLA reference's where(finite, wy·wx, 0) > 1e-12."""
    m = n * taps_y * taps_x
    m2 = 1 << (m - 1).bit_length()
    # live candidates per pixel never exceed cap → post-sort working
    # set shrinks to the next power of two ≥ cap
    p = 1 << max(cap - 1, 1).bit_length()
    p = min(p, m2)

    def kernel(v_ref, wy_ref, wx_ref, img_ref, wgt_ref, rej_ref):
        inf = jnp.full((bh, bw), jnp.inf, jnp.float32)
        zero = jnp.zeros((bh, bw), jnp.float32)

        sv = []
        order = jnp.zeros((bh, bw), jnp.int32)
        wgt = zero
        k = 0
        for f in range(n):
            for ty in range(taps_y):
                # wy_ref is TRANSPOSED [bh, n·taps_y]: its block's minor
                # dim equals the full array dim, which the Mosaic block
                # constraint allows (a [n·taps_y, bh] layout would need
                # a 128-divisible minor)
                wy = wy_ref[:, f * taps_y + ty]       # [bh]
                for tx in range(taps_x):
                    wx = wx_ref[f * taps_x + tx]      # [bw]
                    vk = v_ref[k]
                    w = wy[:, None] * wx[None, :]
                    present = jnp.isfinite(vk) & (w > 1e-12)
                    order = order + jnp.where(present, 1, 0)
                    capped = present & (order <= cap)
                    wgt = wgt + jnp.where(capped, w, 0.0)
                    sv.append(jnp.where(capped, vk, inf))
                    k += 1
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
         static_argnames=("n", "taps_y", "taps_x", "cap", "sigma_low",
                          "sigma_high", "iterations", "interpret",
                          "block_h", "block_w"))
def drizzle_finalize_fused(cand_v_raw, wys_t, wxs, n: int, taps_y: int,
                           taps_x: int, cap: int, sigma_low: float,
                           sigma_high: float, iterations: int,
                           interpret: bool = False,
                           block_h: int = BLOCK_H,
                           block_w: int = BLOCK_W):
    """Finalize [n·taps_y·taps_x, H, W] RAW gathered values (NaN/inf
    preserved — finiteness is tested in-kernel) with per-axis weight
    matrices wys_t [H, n·taps_y] (transposed — see the kernel comment),
    wxs [n·taps_x, W] → (image, weight_map, rejected_map). Half the
    HBM traffic of drizzle_finalize_pallas (no [m, H, W] weight tensor
    exists anywhere)."""
    m, h, w = cand_v_raw.shape
    assert m == n * taps_y * taps_x
    if h % block_h or w % block_w:
        raise ValueError(f"{h}x{w} not divisible by block "
                         f"({block_h}, {block_w})")
    kernel = _make_finalize_fused_kernel(n, taps_y, taps_x, cap, sigma_low,
                                         sigma_high, iterations, block_h,
                                         block_w)
    grid = (h // block_h, w // block_w)
    img, wgt, rej = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_h, block_w), lambda i, j: (0, i, j)),
            pl.BlockSpec((block_h, n * taps_y), lambda i, j: (i, 0)),
            pl.BlockSpec((n * taps_x, block_w), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(cand_v_raw, wys_t, wxs)
    return img, wgt, rej


@partial(jax.jit,
         static_argnames=("cap", "sigma_low", "sigma_high", "iterations",
                          "interpret", "block_h", "block_w"))
def drizzle_finalize_pallas(cand_v, cand_w, cap: int, sigma_low: float,
                            sigma_high: float, iterations: int,
                            interpret: bool = False,
                            block_h: int = BLOCK_H,
                            block_w: int = BLOCK_W):
    """Finalize [m, H, W] ordered candidates → (image, weight_map,
    rejected_map), reading the candidates from HBM once. H must be a
    multiple of block_h and W of block_w (the drizzle driver bands and
    pads accordingly)."""
    m, h, w = cand_v.shape
    if h % block_h or w % block_w:
        raise ValueError(f"{h}x{w} not divisible by block "
                         f"({block_h}, {block_w})")
    kernel = _make_finalize_kernel(m, cap, sigma_low, sigma_high,
                                   iterations, block_h, block_w)
    grid = (h // block_h, w // block_w)
    img, wgt, rej = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_h, block_w), lambda i, j: (0, i, j)),
            pl.BlockSpec((m, block_h, block_w), lambda i, j: (0, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(cand_v, cand_w)
    return img, wgt, rej
