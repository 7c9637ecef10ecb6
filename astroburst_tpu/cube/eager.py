"""In-memory IFU cube processing.

Reference: src-tauri/src/core/cube/eager.rs — mean/median collapse,
per-pixel spectrum, spectral-axis classification from CTYPE3/CUNIT3,
linear wavelength axis, global asinh-normalize stats (1%/99.9%
percentile clamp, α = 10).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu.constants import MAD_TO_SIGMA
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.ops.quantile import masked_rank_values
from astroburst_tpu.stacking.combine import _rank_select

SPECTRAL_CTYPES = ("WAVE", "FREQ", "VELO", "AWAV", "VRAD", "VOPT", "ZOPT",
                   "BETA", "ENER")
SPECTRAL_UNITS = ("M", "CM", "MM", "UM", "NM", "ANGSTROM", "A", "HZ", "KHZ",
                  "MHZ", "GHZ", "M/S", "KM/S", "EV", "KEV")


@jax.jit
def collapse_mean(cube: jax.Array) -> jax.Array:
    """Masked mean over the spectral axis (finite values)."""
    finite = jnp.isfinite(cube)
    cnt = jnp.sum(finite.astype(jnp.float32), axis=0)
    s = jnp.sum(jnp.where(finite, cube, 0.0), axis=0)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)


@jax.jit
def collapse_median(cube: jax.Array) -> jax.Array:
    """Per-pixel median of finite non-zero values (eager.rs:28-55,
    select_nth semantics)."""
    ok = jnp.isfinite(cube) & (cube != 0.0)
    cnt = jnp.sum(ok.astype(jnp.int32), axis=0)
    svals = jnp.sort(jnp.where(ok, cube, jnp.inf), axis=0)
    med = _rank_select(svals, cnt // 2)
    return jnp.where(cnt > 0, med, 0.0)


def extract_spectrum(cube, y: int, x: int) -> np.ndarray:
    return np.asarray(cube[:, y, x])


@dataclass
class SpectralClassification:
    is_spectral: bool
    reason: str
    axis_type: Optional[str]
    axis_unit: Optional[str]
    channel_count: int

    def to_dict(self) -> dict:
        return self.__dict__.copy()


def classify_spectral_cube(header: HduHeader,
                           naxis3: int) -> SpectralClassification:
    """eager.rs:71-145 decision chain."""
    def norm(key):
        v = header.get(key)
        return v.strip().strip("'").strip().upper() if v else None

    ctype3 = norm("CTYPE3")
    cunit3 = norm("CUNIT3")
    has_cdelt3 = header.get_f64("CDELT3") is not None
    has_crval3 = header.get_f64("CRVAL3") is not None

    ctype_spectral = ctype3 is not None and any(
        s in ctype3 for s in SPECTRAL_CTYPES)
    cunit_spectral = cunit3 is not None and any(
        cunit3 == s or s in cunit3 for s in SPECTRAL_UNITS)

    if ctype_spectral:
        return SpectralClassification(
            True, f"CTYPE3 indicates spectral axis: {ctype3}", ctype3,
            cunit3, naxis3)
    if cunit_spectral and has_cdelt3:
        return SpectralClassification(
            True, f"CUNIT3 indicates spectral data: {cunit3}", ctype3,
            cunit3, naxis3)
    if naxis3 <= 4:
        return SpectralClassification(
            False, f"NAXIS3={naxis3} with no spectral keywords: likely "
            f"RGB/RGBA composition", ctype3, cunit3, naxis3)
    if has_cdelt3 and has_crval3:
        return SpectralClassification(
            True, f"NAXIS3={naxis3} with CRVAL3/CDELT3 present: likely "
            f"spectral cube", ctype3, cunit3, naxis3)
    if naxis3 > 10:
        return SpectralClassification(
            True, f"NAXIS3={naxis3}: high channel count suggests spectral "
            f"data", ctype3, cunit3, naxis3)
    return SpectralClassification(
        False, f"NAXIS3={naxis3} with no spectral metadata: ambiguous, "
        f"treating as non-spectral", ctype3, cunit3, naxis3)


def build_wavelength_axis(header: HduHeader) -> Optional[List[float]]:
    """Linear axis from CRVAL3/CDELT3/CRPIX3 (eager.rs:147-159)."""
    crval3 = header.get_f64("CRVAL3")
    cdelt3 = header.get_f64("CDELT3")
    naxis3 = header.get_i64("NAXIS3")
    if crval3 is None or cdelt3 is None or naxis3 is None:
        return None
    crpix3 = header.get_f64("CRPIX3") or 1.0
    return [crval3 + (i - crpix3 + 1.0) * cdelt3 for i in range(naxis3)]


@dataclass
class GlobalCubeStats:
    median: float
    sigma: float
    low: float
    high: float


@jax.jit
def _global_stats_kernel(cube: jax.Array):
    flat = cube.reshape(-1)
    ok = jnp.isfinite(flat) & (flat != 0.0)
    cnt = jnp.sum(ok.astype(jnp.int32))
    n = cnt.astype(jnp.float32)
    xm = jnp.where(ok, flat, jnp.inf)
    mn = jnp.min(xm)
    mx = jnp.max(jnp.where(ok, flat, -jnp.inf))
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    mx = jnp.where(jnp.isfinite(mx), mx, 1.0)
    # select_nth(len/2) + percentiles (eager.rs:185-205)
    ranks = jnp.stack([jnp.floor(n / 2.0) + 1.0,
                       jnp.floor(n * 0.01) + 1.0,
                       jnp.minimum(jnp.floor(n * 0.999), n - 1.0) + 1.0])
    vals = masked_rank_values(xm, ranks, mn, mx)
    med = vals[0]
    dev = jnp.where(ok, jnp.abs(flat - med), jnp.inf)
    mad = masked_rank_values(dev, (jnp.floor(n / 2.0) + 1.0)[None],
                             jnp.float32(0.0),
                             jnp.maximum(mx - mn, 1e-30))[0]
    return cnt, med, mad, vals[1], vals[2]


def compute_global_stats(cube) -> GlobalCubeStats:
    cnt, med, mad, low, high = _global_stats_kernel(jnp.asarray(cube))
    if int(cnt) == 0:
        return GlobalCubeStats(0.0, 1.0, 0.0, 1.0)
    return GlobalCubeStats(
        median=float(med),
        sigma=max(float(mad) * MAD_TO_SIGMA, 1e-10),
        low=float(low), high=float(high))


@jax.jit
def _normalize_kernel(data, median, sigma, low, high):
    alpha = 10.0
    clamped = jnp.clip(data, low, high)
    scaled = (alpha / sigma) * (clamped - median)
    return jnp.where(jnp.isfinite(data), jnp.arcsinh(scaled), 0.0)


def normalize_with_global(data, g: GlobalCubeStats) -> jax.Array:
    """asinh preview normalize (eager.rs:210-222)."""
    return _normalize_kernel(jnp.asarray(data), jnp.float32(g.median),
                             jnp.float32(g.sigma), jnp.float32(g.low),
                             jnp.float32(g.high))
