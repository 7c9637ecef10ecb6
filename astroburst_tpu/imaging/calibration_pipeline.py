"""Batch calibration pipeline.

Reference: src-tauri/src/core/imaging/calibration_pipeline.rs —
per-channel light calibration (bias/dark/flat masters), optional
per-frame mean normalization, sigma-clipped mean stack (median/MAD
every iteration, strict z bounds, σ<1e-10 and no-removal early stops),
per-frame rejection counts, min-max channel normalization, optional
RGB merge of the first three channel masters.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.constants import MAD_TO_SIGMA
from astroburst_tpu.errors import InvalidInput
from astroburst_tpu.stacking.calibration import CalibrationConfig, \
    calibrate_image
from astroburst_tpu.stacking.combine import _masked_median_mad_axis0


@dataclass
class BatchStackConfig:
    sigma_low: float = 2.5
    sigma_high: float = 3.0
    max_iterations: int = 5
    normalize_before_stack: bool = True


@dataclass
class ChannelInput:
    label: str
    lights: List  # list of [H, W] arrays


@dataclass
class BatchChannelStats:
    label: str
    lights_input: int
    lights_after_rejection: List[int]
    mean: float
    stddev: float

    def to_dict(self) -> dict:
        return self.__dict__.copy()


@dataclass
class BatchPipelineResult:
    master_channels: List[Tuple[str, jax.Array]]
    rgb: Optional[jax.Array]  # [3, H, W]
    stats: dict


@partial(jax.jit, static_argnames=("sigma_low", "sigma_high", "max_iter"))
def sigma_clipped_mean_stack(stack: jax.Array, sigma_low: float,
                             sigma_high: float, max_iter: int):
    """All-iterations median/MAD clip with strict bounds
    (calibration_pipeline.rs:317-377). Returns (mean [H,W],
    per-frame rejection counts [N])."""
    n = stack.shape[0]
    mask = jnp.ones(stack.shape, bool)  # reference takes raw values as-is
    stopped = jnp.zeros(stack.shape[1:], bool)
    for _ in range(max_iter):
        cnt = jnp.sum(mask.astype(jnp.int32), axis=0)
        med, mad, _ = _masked_median_mad_axis0(stack, mask)
        sigma = (mad * MAD_TO_SIGMA).astype(jnp.float32)
        active = (cnt >= 3) & ~stopped & (sigma >= 1e-10)
        stopped = stopped | (sigma < 1e-10)
        z = (stack - med) / jnp.maximum(sigma, 1e-30)
        keep = (z > -sigma_low) & (z < sigma_high)
        new_mask = jnp.where(active[None], mask & keep, mask)
        removed = cnt - jnp.sum(new_mask.astype(jnp.int32), axis=0)
        stopped = stopped | (active & (removed == 0))
        mask = new_mask
    final_cnt = jnp.sum(mask.astype(jnp.int32), axis=0)
    mean = jnp.sum(jnp.where(mask, stack, 0.0), axis=0) / jnp.maximum(
        final_cnt.astype(jnp.float32), 1.0)
    mean = jnp.where(final_cnt > 0, mean, 0.0)
    rejected_per_frame = jnp.sum((~mask).astype(jnp.int32), axis=(1, 2))
    return mean, rejected_per_frame


@jax.jit
def _normalize_channel(ch: jax.Array) -> jax.Array:
    """Raw min-max normalize (calibration_pipeline.rs:286-303)."""
    mn = jnp.min(ch)
    mx = jnp.max(ch)
    rng = mx - mn
    out = jnp.clip((ch - mn) / jnp.maximum(rng, 1e-30), 0.0, 1.0)
    return jnp.where(rng < 1e-10, jnp.zeros_like(ch), out)


@jax.jit
def _mean_normalize_frame(frame: jax.Array) -> jax.Array:
    mean = jnp.mean(frame)
    return jnp.where(mean > 0, frame / jnp.maximum(mean, 1e-30), frame)


def run_batch_pipeline(channels: Sequence[ChannelInput],
                       masters: CalibrationConfig = CalibrationConfig(),
                       config: BatchStackConfig = BatchStackConfig()
                       ) -> BatchPipelineResult:
    """calibration_pipeline.rs:120-194."""
    if not channels:
        raise InvalidInput("No channels provided")
    master_channels: List[Tuple[str, jax.Array]] = []
    channel_stats: List[BatchChannelStats] = []
    for ch in channels:
        if not ch.lights:
            raise InvalidInput(f"Channel '{ch.label}' has no light frames")
        calibrated = [calibrate_image(l, masters) for l in ch.lights]
        if config.normalize_before_stack:
            calibrated = [_mean_normalize_frame(f) for f in calibrated]
        stack = jnp.stack(calibrated)
        master, rejected = sigma_clipped_mean_stack(
            stack, config.sigma_low, config.sigma_high,
            config.max_iterations)
        master = _normalize_channel(master)
        master_channels.append((ch.label, master))
        m = np.asarray(master)
        channel_stats.append(BatchChannelStats(
            label=ch.label, lights_input=len(ch.lights),
            lights_after_rejection=[int(x) for x in np.asarray(rejected)],
            mean=float(m.mean()), stddev=float(m.std())))

    rgb = None
    if len(master_channels) >= 3:
        dims = [m.shape for _, m in master_channels[:3]]
        if len(set(dims)) == 1:
            rgb = jnp.stack([m for _, m in master_channels[:3]])

    return BatchPipelineResult(
        master_channels=master_channels, rgb=rgb,
        stats={
            "bias_combined": 1 if masters.master_bias is not None else 0,
            "darks_combined": 1 if masters.master_dark is not None else 0,
            "flats_combined": 1 if masters.master_flat is not None else 0,
            "channels": [s.to_dict() for s in channel_stats],
        })
