"""Cube commands (reference: src-tauri/src/cmd/cube.rs)."""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from astroburst_tpu import constants as C
from astroburst_tpu import io as aio
from astroburst_tpu.api.common import Timer
from astroburst_tpu.cube import (LazyCube, build_wavelength_axis,
                                 classify_spectral_cube, collapse_mean,
                                 collapse_median, compute_global_stats,
                                 normalize_with_global)
from astroburst_tpu.io.png import save_gray_png
from astroburst_tpu.runtime.output import resolve_output_dir

# open lazy cubes keyed by path (the reference holds them app-side)
_LAZY_LOCK = threading.Lock()
_LAZY_CUBES: Dict[str, LazyCube] = {}


def _get_lazy(path: str) -> LazyCube:
    resolved = aio.resolve_single_image(path)
    with _LAZY_LOCK:
        cube = _LAZY_CUBES.get(resolved)
        if cube is None:
            cube = LazyCube(resolved)
            _LAZY_CUBES[resolved] = cube
        return cube


@jax.jit
def _norm_u8_kernel(norm):
    mn = jnp.min(norm)
    rng = jnp.maximum(jnp.max(norm) - mn, 1e-10)
    return jnp.clip((norm - mn) * (255.0 / rng), 0, 255).astype(jnp.uint8)


def _norm_u8(plane, g):
    """Device-side normalize + u8 quantize (async dispatch)."""
    return _norm_u8_kernel(normalize_with_global(plane, g))


def _save_norm_png(plane, g, path: str) -> None:
    save_gray_png(np.asarray(_norm_u8(plane, g)), path)


def _save_pngs_pipelined(u8_frames, paths, workers: int = 4) -> None:
    """Fetch + PNG-encode already-dispatched u8 device frames on a
    thread pool — device renders overlap host encoding (the reference
    renders sampled cube frames serially, cmd/cube.rs:15)."""
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        futs = [pool.submit(lambda u, p: save_gray_png(np.asarray(u), p),
                            u8, path)
                for u8, path in zip(u8_frames, paths)]
        for f in futs:
            f.result()


def process_cube_cmd(path: str, output_dir: str = "",
                     frame_step: Optional[int] = None) -> dict:
    """cmd/cube.rs:15 — eager cube: collapses, spectrum, sampled frames."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    resolved = aio.resolve_single_image(path)
    result = aio.extract_cube(resolved)
    cube = jnp.asarray(result.cube)
    depth, rows, cols = cube.shape

    g = compute_global_stats(cube)
    mean_img = collapse_mean(cube)
    median_img = collapse_median(cube)
    stem = os.path.splitext(os.path.basename(path))[0]
    collapsed_path = os.path.join(out_dir, f"{stem}_collapsed.png")
    collapsed_median_path = os.path.join(out_dir,
                                         f"{stem}_collapsed_median.png")
    _save_norm_png(mean_img, g, collapsed_path)
    _save_norm_png(median_img, g, collapsed_median_path)

    frames_dir = os.path.join(out_dir, f"{stem}_frames")
    os.makedirs(frames_dir, exist_ok=True)
    step = max(frame_step or max(depth // 16, 1), 1)
    zs = list(range(0, depth, step))
    u8s = [_norm_u8(cube[z], g) for z in zs]  # async device renders
    _save_pngs_pipelined(
        u8s, [os.path.join(frames_dir, f"frame_{i:04}.png")
              for i in range(len(zs))])
    count = len(zs)

    spectrum = np.asarray(cube[:, rows // 2, cols // 2])
    classification = classify_spectral_cube(result.header, depth)
    wavelengths = build_wavelength_axis(result.header)
    return {
        C.RES_DIMENSIONS: [cols, rows, depth],
        "collapsed_path": collapsed_path,
        "collapsed_median_path": collapsed_median_path,
        "frames_dir": frames_dir,
        C.RES_FRAME_COUNT: count,
        "center_spectrum": [float(v) for v in spectrum],
        C.RES_WAVELENGTHS: wavelengths,
        C.RES_SPECTRAL_CLASSIFICATION: classification.to_dict(),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def process_cube_lazy_cmd(path: str, output_dir: str = "",
                          frame_step: Optional[int] = None) -> dict:
    """cmd/cube.rs:27 — lazy mmap cube (2 GB opens without
    materializing)."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    cube = _get_lazy(path)
    g0 = cube.geometry
    mean_img = jnp.asarray(cube.collapse_mean())
    median_img = jnp.asarray(cube.collapse_median())
    g = compute_global_stats(mean_img)
    stem = os.path.splitext(os.path.basename(path))[0]
    collapsed_path = os.path.join(out_dir, f"{stem}_collapsed.png")
    collapsed_median_path = os.path.join(out_dir,
                                         f"{stem}_collapsed_median.png")
    _save_norm_png(mean_img, g, collapsed_path)
    _save_norm_png(median_img, g, collapsed_median_path)

    frames_dir = os.path.join(out_dir, f"{stem}_frames")
    os.makedirs(frames_dir, exist_ok=True)
    step = max(frame_step or max(g0.naxis3 // 16, 1), 1)
    zs = list(range(0, g0.naxis3, step))
    u8s = [_norm_u8(jnp.asarray(cube.get_frame(z)), g) for z in zs]
    _save_pngs_pipelined(
        u8s, [os.path.join(frames_dir, f"frame_{i:04}.png")
              for i in range(len(zs))])
    count = len(zs)

    spectrum = cube.spectrum(g0.naxis2 // 2, g0.naxis1 // 2)
    classification = classify_spectral_cube(cube.header, g0.naxis3)
    return {
        C.RES_DIMENSIONS: [g0.naxis1, g0.naxis2, g0.naxis3],
        "collapsed_path": collapsed_path,
        "collapsed_median_path": collapsed_median_path,
        "frames_dir": frames_dir,
        C.RES_FRAME_COUNT: count,
        "total_frames": g0.naxis3,
        "center_spectrum": [float(v) for v in spectrum],
        C.RES_WAVELENGTHS: build_wavelength_axis(cube.header),
        C.RES_SPECTRAL_CLASSIFICATION: classification.to_dict(),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def get_cube_info(path: str) -> dict:
    """cmd/cube.rs:39."""
    t0 = Timer()
    cube = _get_lazy(path)
    g = cube.geometry
    classification = classify_spectral_cube(cube.header, g.naxis3)
    return {
        C.RES_NAXIS1: g.naxis1,
        C.RES_NAXIS2: g.naxis2,
        C.RES_NAXIS3: g.naxis3,
        C.RES_BITPIX: g.bitpix,
        C.RES_SPECTRAL_CLASSIFICATION: classification.to_dict(),
        C.RES_WAVELENGTHS: build_wavelength_axis(cube.header),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def get_cube_frame(path: str, frame_index: int,
                   output_dir: str = "") -> dict:
    """cmd/cube.rs:63."""
    t0 = Timer()
    out_dir = resolve_output_dir(output_dir)
    cube = _get_lazy(path)
    frame = jnp.asarray(cube.get_frame(frame_index))
    g = compute_global_stats(frame)
    stem = os.path.splitext(os.path.basename(path))[0]
    png_path = os.path.join(out_dir, f"{stem}_frame_{frame_index:04}.png")
    _save_norm_png(frame, g, png_path)
    return {
        C.RES_FRAME_INDEX: frame_index,
        C.RES_PNG_PATH: png_path,
        C.RES_DIMENSIONS: [cube.geometry.naxis1, cube.geometry.naxis2],
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def get_cube_spectrum(path: str, x: int, y: int) -> dict:
    """cmd/cube.rs:88."""
    t0 = Timer()
    cube = _get_lazy(path)
    spectrum = cube.spectrum(int(y), int(x))
    return {
        C.RES_X: x,
        C.RES_Y: y,
        C.RES_SPECTRUM: [float(v) for v in spectrum],
        C.RES_WAVELENGTHS: build_wavelength_axis(cube.header),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }
