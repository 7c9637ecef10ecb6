"""Star mask generation.

Reference: src-tauri/src/core/imaging/star_mask.rs — per-star disks of
radius FWHM·growth with a smoothstep soft edge, max-combined, optional
luminance-ceiling protection, coverage fraction.

TPU design: detection gives ≤K stars as dense arrays; the mask paints
one fixed-size window per star inside a lax.fori_loop of
dynamic-slice/max/dynamic-update-slice — sequential over ≤K stars, but
each step is a tiny on-chip stencil, all in one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.analysis.star_detection import detect_stars

WINDOW = 96  # covers soft_radius up to 47 px each side of center


@dataclass
class StarMaskConfig:
    growth_factor: float = 2.5
    softness: float = 4.0
    detection_sigma: float = 5.0
    min_fwhm: float = 1.5
    max_fwhm: float = 30.0
    luminance_protect: bool = False
    luminance_ceiling: float = 0.85


@dataclass
class StarMaskResult:
    mask: jax.Array
    stars_masked: int
    coverage_fraction: float


@partial(jax.jit, static_argnames=("luminance_protect",))
def _mask_kernel(image, xs, ys, radii, softness, luminance_ceiling,
                 luminance_protect: bool):
    h, w = image.shape
    half = WINDOW // 2
    mask0 = jnp.zeros((h + WINDOW, w + WINDOW), jnp.float32)  # padded
    win_y = jnp.arange(WINDOW, dtype=jnp.float32)[:, None]
    win_x = jnp.arange(WINDOW, dtype=jnp.float32)[None, :]

    def paint(i, mask):
        x = xs[i]
        y = ys[i]
        radius = radii[i]
        soft_radius = radius + softness
        r2_inner = radius * radius
        r2_outer = soft_radius * soft_radius
        fade = jnp.maximum(r2_outer - r2_inner, 1e-10)
        # padded-mask origin sits at image coord -half, so the window
        # top-left (star - half in image space) is round(star) in
        # padded space; clip keeps the slice in bounds
        y0 = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h)
        x0 = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w)
        # window pixel coords back in image space
        py = y0.astype(jnp.float32) + win_y - half
        px = x0.astype(jnp.float32) + win_x - half
        d2 = (px - x) ** 2 + (py - y) ** 2
        t = jnp.clip((d2 - r2_inner) / fade, 0.0, 1.0)
        val = jnp.where(d2 <= r2_inner, 1.0,
                        jnp.where(d2 <= r2_outer,
                                  1.0 - t * t * (3.0 - 2.0 * t), 0.0))
        val = jnp.where(radius > 0.0, val, 0.0)
        cur = jax.lax.dynamic_slice(mask, (y0, x0), (WINDOW, WINDOW))
        return jax.lax.dynamic_update_slice(mask, jnp.maximum(cur, val),
                                            (y0, x0))

    mask = jax.lax.fori_loop(0, xs.shape[0], paint, mask0)
    mask = mask[half:half + h, half:half + w]

    if luminance_protect:
        ceiling = luminance_ceiling
        inv_range = jnp.where(ceiling < 1.0, 1.0 / (1.0 - ceiling), 1.0)
        excess = jnp.clip((image - ceiling) * inv_range, 0.0, 1.0)
        smooth = excess * excess * (3.0 - 2.0 * excess)
        lum = (image > ceiling) & (mask < 1.0)
        mask = jnp.where(lum, jnp.maximum(mask, smooth), mask)

    coverage = jnp.sum((mask > 0.01).astype(jnp.float32)) / (h * w)
    return mask, coverage


def generate_star_mask_from_detection(image, detection,
                                      config: StarMaskConfig) -> StarMaskResult:
    img = jnp.asarray(image)
    stars = [s for s in detection.stars
             if config.min_fwhm <= s.fwhm <= config.max_fwhm]
    k = max(len(stars), 1)
    xs = np.zeros(k, np.float32)
    ys = np.zeros(k, np.float32)
    radii = np.zeros(k, np.float32)
    for i, s in enumerate(stars):
        xs[i] = s.x
        ys[i] = s.y
        radii[i] = s.fwhm * config.growth_factor
    mask, coverage = _mask_kernel(
        img, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(radii),
        jnp.float32(config.softness), jnp.float32(config.luminance_ceiling),
        config.luminance_protect)
    return StarMaskResult(mask=mask, stars_masked=len(stars),
                          coverage_fraction=float(coverage))


def generate_star_mask(image, config: StarMaskConfig = StarMaskConfig()
                       ) -> StarMaskResult:
    detection = detect_stars(jnp.asarray(image), config.detection_sigma)
    return generate_star_mask_from_detection(image, detection, config)
