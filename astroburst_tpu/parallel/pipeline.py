"""Fused align + stack + stretch pipeline, single-chip and sharded.

This is the BASELINE.json headline path: N raw frames [N, H, W] →
phase-correlation alignment to frame 0 → bicubic subpixel shift →
per-pixel sigma-clip combine → robust stats → auto-STF stretch, all
one XLA program (no host syncs).

Sharded version: frames axis carries the alignment fan-out
(data-parallel over exposures); a sharding constraint re-lays the
aligned stack out over spatial rows for the per-pixel combine and the
stretch, letting GSPMD insert the all-to-all / psum collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from astroburst_tpu.alignment.phase_correlation import _phase_correlate_traced
from astroburst_tpu.imaging.stf import apply_stf_traced, auto_stf_traced
from astroburst_tpu.ops.resample import shift_bicubic
from astroburst_tpu.ops.stats import stats_core
from astroburst_tpu.stacking.combine import sigma_clip_core


def _use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def align_stack_stretch(stack: jax.Array, sigma_low: float = 3.0,
                        sigma_high: float = 3.0, max_iter: int = 5,
                        align: bool = True, exact_pair: bool = False,
                        use_pallas: bool | None = None,
                        true_shape: tuple | None = None,
                        off_max: int = 16):
    """Pure traced pipeline over [N, H, W]; returns a dict of arrays:
    combined f32 [H,W], preview u8 [H,W], offsets [N,2] f32,
    confidences [N] f32, rejected i32, stf (shadow, midtone) f32.

    On TPU the shift + sigma-clip stage runs as the one-pass Pallas
    kernel (stacking.onepass_kernel): ONE read of the raw stack, no
    pad/preshift round trips. Alignment offsets are clamped to
    ±off_max on that path (dithered exposure offsets are small; the
    two-stage ±253 px kernel remains for use_pallas="two_stage").
    ``true_shape=(h, w)`` marks ``stack`` as already padded by
    onepass_kernel.pad_stack_aligned — pre-pad at ingest to keep this
    a true one-pass program."""
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    from astroburst_tpu.stacking.onepass_kernel import (MAX_FRAMES,
                                                        shift_clip_onepass)
    n = stack.shape[0]
    if true_shape is not None:
        h, w = true_shape
        view = stack[:, :h, :w]  # lazy; fuses into the coarse downsample
    else:
        view = stack
    ref = view[0]
    if align and n > 1:
        def est(frame):
            return _phase_correlate_traced(ref, frame)

        dys1, dxs1, confs1 = jax.vmap(est)(view[1:])
        dys = jnp.concatenate([jnp.zeros(1, jnp.float32), dys1])
        dxs = jnp.concatenate([jnp.zeros(1, jnp.float32), dxs1])
        confs = jnp.concatenate([jnp.zeros(1, jnp.float32), confs1])
    else:
        dys = jnp.zeros(n, jnp.float32)
        dxs = jnp.zeros(n, jnp.float32)
        confs = jnp.zeros(n, jnp.float32)

    if use_pallas == "two_stage" or (use_pallas and n > MAX_FRAMES):
        from astroburst_tpu.stacking.fused_kernel import shift_clip_fused
        combined, rejected = shift_clip_fused(view, dys, dxs, sigma_low,
                                              sigma_high, max_iter)
    elif use_pallas:
        combined, rejected = shift_clip_onepass(
            stack, dys, dxs, sigma_low, sigma_high, max_iter,
            off_max=off_max, true_shape=true_shape)
    else:
        full = jax.vmap(shift_bicubic)(view, dys, dxs)
        combined, rejected = sigma_clip_core(full, sigma_low, sigma_high,
                                             max_iter)
    mn, mx, _total, count, med, mad = stats_core(combined, exact_pair)
    sigma = jnp.maximum(mad * 1.4826, 1e-30)
    shadow, midtone = auto_stf_traced(mn, mx, med, sigma, count)
    preview = apply_stf_traced(combined, mn, mx, shadow, midtone, as_u8=True)
    return {
        "combined": combined,
        "preview": preview,
        "offsets": jnp.stack([dys, dxs], axis=1),
        "confidences": confs,
        "rejected": rejected,
        "stf": jnp.stack([shadow, midtone]),
        "data_range": jnp.stack([mn, mx]),
    }


def make_sharded_stack_step(mesh: Mesh, sigma_low: float = 3.0,
                            sigma_high: float = 3.0, max_iter: int = 5,
                            align: bool = True):
    """jit the pipeline over a (frames, rows) mesh.

    Alignment runs frame-sharded; the combine/stretch run row-sharded
    — the constraint between them is where GSPMD places the reshard
    collective (all-to-all over ICI).
    """
    row_axis = "rows" if "rows" in mesh.axis_names else "frames"
    frames_spec = NamedSharding(mesh, P("frames", None, None))
    stack_rows_spec = NamedSharding(mesh, P(None, row_axis, None))
    rows_spec = NamedSharding(mesh, P(row_axis, None))

    def step(stack):
        stack = jax.lax.with_sharding_constraint(stack, frames_spec)
        n = stack.shape[0]
        ref = stack[0]
        if align and n > 1:
            def one(frame):
                dy, dx, conf = _phase_correlate_traced(ref, frame)
                return shift_bicubic(frame, dy, dx), dy, dx, conf

            aligned, dys, dxs, confs = jax.vmap(one)(stack[1:])
            full = jnp.concatenate([stack[:1], aligned], axis=0)
            dys = jnp.concatenate([jnp.zeros(1, jnp.float32), dys])
            dxs = jnp.concatenate([jnp.zeros(1, jnp.float32), dxs])
            confs = jnp.concatenate([jnp.zeros(1, jnp.float32), confs])
        else:
            full = stack
            dys = jnp.zeros(n, jnp.float32)
            dxs = jnp.zeros(n, jnp.float32)
            confs = jnp.zeros(n, jnp.float32)

        # reshard: frame-parallel → row-parallel for the pixel reduction
        full = jax.lax.with_sharding_constraint(full, stack_rows_spec)
        combined, rejected = sigma_clip_core(full, sigma_low, sigma_high,
                                             max_iter)
        combined = jax.lax.with_sharding_constraint(combined, rows_spec)
        mn, mx, _t, count, med, mad = stats_core(combined, False)
        sigma = jnp.maximum(mad * 1.4826, 1e-30)
        shadow, midtone = auto_stf_traced(mn, mx, med, sigma, count)
        preview = apply_stf_traced(combined, mn, mx, shadow, midtone,
                                   as_u8=True)
        return {
            "combined": combined,
            "preview": preview,
            "offsets": jnp.stack([dys, dxs], axis=1),
            "confidences": confs,
            "rejected": rejected,
            "stf": jnp.stack([shadow, midtone]),
        }

    return jax.jit(step)
