"""Synthetic generation pipeline.

Reference: src-tauri/src/core/synth/pipeline.rs — generate /
generate_stack (per-frame reseeded noise for stacking fixtures), FITS
and star-catalog export.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dc_field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.io import write_fits_mono
from astroburst_tpu.synth.noise import (NoiseParams, apply_flat_field,
                                        apply_noise, generate_flat_field)
from astroburst_tpu.synth.psf import AiryPsf, GaussianPsf, MoffatPsf, \
    render_stars
from astroburst_tpu.synth.star_field import (FieldConfig, Star,
                                             exponential_disk, king_cluster,
                                             uniform_field)


@dataclass
class SynthConfig:
    field: FieldConfig = dc_field(default_factory=FieldConfig)
    field_type: str = "uniform"   # uniform | king_cluster | exponential_disk
    core_radius: float = 50.0
    tidal_radius: float = 400.0
    scale_length: float = 200.0
    inclination_deg: float = 45.0
    psf_type: str = "gaussian"    # gaussian | moffat | airy
    psf_fwhm: float = 3.0
    moffat_beta: float = 2.5
    airy_lambda_over_d: float = 2.0
    noise: NoiseParams = dc_field(default_factory=NoiseParams)
    apply_vignette: bool = False
    vignette_strength: float = 0.3
    n_frames: int = 1


def _gen_field(config: SynthConfig) -> List[Star]:
    if config.field_type == "king_cluster":
        return king_cluster(config.field, config.core_radius,
                            config.tidal_radius)
    if config.field_type == "exponential_disk":
        return exponential_disk(config.field, config.scale_length,
                                config.inclination_deg)
    return uniform_field(config.field)


def _make_psf(config: SynthConfig):
    if config.psf_type == "moffat":
        return MoffatPsf.from_fwhm(config.psf_fwhm, config.moffat_beta)
    if config.psf_type == "airy":
        return AiryPsf(config.airy_lambda_over_d)
    return GaussianPsf.from_fwhm(config.psf_fwhm)


def generate(config: SynthConfig = SynthConfig()
             ) -> Tuple[jax.Array, jax.Array, List[Star]]:
    """(noisy, ground_truth, stars) (pipeline.rs:63-85)."""
    stars = _gen_field(config)
    psf = _make_psf(config)
    ground_truth = render_stars(stars, psf, config.field.width,
                                config.field.height)
    image = ground_truth
    if config.apply_vignette:
        flat = generate_flat_field(config.field.width, config.field.height,
                                   config.noise.seed + 999,
                                   config.vignette_strength)
        image = apply_flat_field(image, flat)
    noisy = apply_noise(image, config.noise)
    return noisy, ground_truth, stars


def generate_stack(config: SynthConfig
                   ) -> Tuple[List[jax.Array], jax.Array, List[Star]]:
    """Per-frame reseeded noisy frames over one ground truth
    (pipeline.rs:87-114)."""
    stars = _gen_field(config)
    psf = _make_psf(config)
    gt = render_stars(stars, psf, config.field.width, config.field.height)
    frames = []
    for i in range(config.n_frames):
        img = gt
        if config.apply_vignette:
            flat = generate_flat_field(
                config.field.width, config.field.height,
                config.noise.seed + 999 + i, config.vignette_strength)
            img = apply_flat_field(img, flat)
        params = dataclasses.replace(config.noise,
                                     seed=config.noise.seed + i * 7919)
        frames.append(apply_noise(img, params))
    return frames, gt, stars


def save_fits(image, path: str) -> None:
    write_fits_mono(path, np.asarray(image))


def save_catalog(stars: List[Star], path: str) -> None:
    lines = ["id,x,y,z,flux,temperature"]
    for i, s in enumerate(stars):
        lines.append(f"{i},{s.x:.4f},{s.y:.4f},{s.z:.4f},{s.flux:.4f},"
                     f"{s.temperature:.1f}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
