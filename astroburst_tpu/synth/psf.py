"""PSF renderers: Gaussian / Moffat / Airy.

Reference: src-tauri/src/core/synth/psf.rs. Rendering paints each star
into a fixed window (per-window flux normalization as the reference
does) inside one fori_loop of dynamic slices on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import List, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.synth.star_field import Star

FWHM_TO_SIGMA = 2.3548


@dataclass(frozen=True)
class GaussianPsf:
    sigma: float

    @staticmethod
    def from_fwhm(fwhm: float) -> "GaussianPsf":
        return GaussianPsf(sigma=fwhm / FWHM_TO_SIGMA)

    def radius(self) -> float:
        return self.sigma * 4.0

    def evaluate(self, d2):
        return jnp.exp(-d2 / (2.0 * self.sigma * self.sigma))


@dataclass(frozen=True)
class MoffatPsf:
    alpha: float
    beta: float

    @staticmethod
    def from_fwhm(fwhm: float, beta: float) -> "MoffatPsf":
        alpha = fwhm / (2.0 * math.sqrt(2.0 ** (1.0 / beta) - 1.0))
        return MoffatPsf(alpha=alpha, beta=beta)

    def radius(self) -> float:
        return self.alpha * 5.0

    def evaluate(self, d2):
        return jnp.power(1.0 + d2 / (self.alpha * self.alpha), -self.beta)


def _bessel_j1(x):
    """Polynomial J1 approximation (psf.rs:100-121, Numerical Recipes)."""
    ax = jnp.abs(x)
    y_small = x * x
    num = x * (72362614232.0 + y_small * (-7895059235.0 + y_small *
               (242396853.1 + y_small * (-2972611.439 + y_small *
                (15704.4826 + y_small * (-30.16036606))))))
    den = (144725228442.0 + y_small * (2300535178.0 + y_small *
           (18583304.74 + y_small * (99447.43394 + y_small *
            (376.9991397 + y_small)))))
    small = num / den
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y_big = z * z
    xx = ax - 2.356194491
    p = 1.0 + y_big * (0.183105e-2 + y_big * (-0.3516396496e-4 + y_big *
                       (0.2457520174e-5 + y_big * (-0.240337019e-6))))
    q = (0.04687499995 + y_big * (-0.2002690873e-3 + y_big *
         (0.8449199096e-5 + y_big * (-0.88228987e-6 + y_big *
          0.105787412e-6))))
    big = (0.5641895835 / jnp.sqrt(jnp.maximum(ax, 1e-30))) * (
        jnp.cos(xx) * p - z * jnp.sin(xx) * q)
    big = jnp.where(x < 0, -big, big)
    return jnp.where(ax < 8.0, small, big)


@dataclass(frozen=True)
class AiryPsf:
    lambda_over_d: float

    def radius(self) -> float:
        return self.lambda_over_d * 4.0

    def evaluate(self, d2):
        r = jnp.sqrt(d2)
        x = r * (jnp.pi / self.lambda_over_d)
        v = 2.0 * _bessel_j1(x) / jnp.maximum(x, 1e-30)
        return jnp.where(r < 1e-10, 1.0, v * v)


def render_stars(stars: List[Star], psf, width: int, height: int) -> jax.Array:
    """Flux-normalized windowed star painting (psf.rs:123-170)."""
    if not stars:
        return jnp.zeros((height, width), jnp.float32)
    half = int(math.ceil(psf.radius()))
    window = 2 * half + 1
    xs = jnp.asarray([s.x for s in stars], jnp.float32)
    ys = jnp.asarray([s.y for s in stars], jnp.float32)
    fluxes = jnp.asarray([s.flux for s in stars], jnp.float32)

    @partial(jax.jit, static_argnames=())
    def kernel(xs, ys, fluxes):
        img0 = jnp.zeros((height + 2 * window, width + 2 * window),
                         jnp.float32)
        wy = jnp.arange(window, dtype=jnp.float32)[:, None]
        wx = jnp.arange(window, dtype=jnp.float32)[None, :]

        def paint(i, img):
            sx, sy, flux = xs[i], ys[i], fluxes[i]
            # window top-left so the star center is inside; padded origin
            # at image coord -window
            y0 = jnp.clip(jnp.round(sy).astype(jnp.int32) - half + window, 0,
                          height + window)
            x0 = jnp.clip(jnp.round(sx).astype(jnp.int32) - half + window, 0,
                          width + window)
            py = y0.astype(jnp.float32) + wy - window
            px = x0.astype(jnp.float32) + wx - window
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            vals = psf.evaluate(d2)
            # normalize over in-image pixels like the reference's window sum
            inside = ((py >= 0) & (py <= height - 1) & (px >= 0) &
                      (px <= width - 1))
            vals = jnp.where(inside, vals, 0.0)
            total = jnp.sum(vals)
            norm = jnp.where(total > 1e-20, flux / jnp.maximum(total, 1e-30),
                             0.0)
            cur = jax.lax.dynamic_slice(img, (y0, x0), (window, window))
            return jax.lax.dynamic_update_slice(img, cur + vals * norm,
                                                (y0, x0))

        img = jax.lax.fori_loop(0, xs.shape[0], paint, img0)
        return img[window:window + height, window:window + width]

    return kernel(xs, ys, fluxes)
