"""Export commands (reference: src-tauri/src/cmd/export/mod.rs)."""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from astroburst_tpu import constants as C
from astroburst_tpu.api import helpers
from astroburst_tpu.api.common import (Timer, extract_image_resolved,
                                       load_from_cache_or_disk,
                                       try_extract_rgb_resolved)
from astroburst_tpu.dtypes import AutoStfConfig, StfParams
from astroburst_tpu.imaging.resample import resample_image
from astroburst_tpu.imaging.stf import apply_stf_f32, auto_stf
from astroburst_tpu.io import write_fits_mono, write_fits_rgb
from astroburst_tpu.io.fits_writer import filter_header
from astroburst_tpu.io.png import save_gray_png, save_rgb_png
from astroburst_tpu.ops.stats import compute_image_stats
from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE


def _file_size(path: str) -> int:
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def export_fits(path: str, output_path: str,
                apply_stf_stretch: Optional[bool] = None,
                shadow: Optional[float] = None,
                midtone: Optional[float] = None,
                highlight: Optional[float] = None,
                copy_wcs: Optional[bool] = None,
                copy_metadata: Optional[bool] = None,
                bitpix: Optional[int] = None) -> dict:
    """export/mod.rs:16 — user-STF or linear, header filtering, BITPIX."""
    t0 = Timer()
    do_stf = bool(apply_stf_stretch)
    do_wcs = copy_wcs if copy_wcs is not None else True
    do_meta = copy_metadata if copy_metadata is not None else True
    target_bitpix = bitpix if bitpix is not None else -32

    resolved = extract_image_resolved(path)
    filtered = filter_header(resolved.header, do_wcs, do_meta)
    try:
        entry = load_from_cache_or_disk(path)
        source = entry.image
    except Exception:
        source = jnp.asarray(resolved.arr)

    if do_stf:
        stf = StfParams(shadow=shadow or 0.0,
                        midtone=midtone if midtone is not None else 0.5,
                        highlight=highlight if highlight is not None else 1.0)
        stats = compute_image_stats(source)
        source = apply_stf_f32(source, stf, stats)
    write_fits_mono(output_path, np.asarray(source), filtered, target_bitpix)
    return {
        C.RES_OUTPUT_PATH: output_path,
        C.RES_BITPIX: target_bitpix,
        C.RES_APPLY_STF: do_stf,
        C.COPY_WCS: do_wcs,
        C.RES_COPY_METADATA: do_meta,
        C.RES_FILE_SIZE_BYTES: _file_size(output_path),
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def export_fits_rgb(output_path: str, r_path: Optional[str] = None,
                    g_path: Optional[str] = None,
                    b_path: Optional[str] = None,
                    copy_wcs: Optional[bool] = None,
                    copy_metadata: Optional[bool] = None,
                    bitpix: Optional[int] = None) -> dict:
    """export/mod.rs:73 — composite-cache-aware RGB export."""
    t0 = Timer()
    do_wcs = copy_wcs if copy_wcs is not None else True
    do_meta = copy_metadata if copy_metadata is not None else True
    target_bitpix = bitpix if bitpix is not None else -32

    cr = GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_R)
    cg = GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_G)
    cb = GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_B)
    if cr is not None and cg is not None and cb is not None:
        header = None
        if r_path and not r_path.startswith("__"):
            try:
                header = extract_image_resolved(r_path).header
            except Exception:
                header = None
        if header is None:
            header = cr.header
        r_arr, g_arr, b_arr = cr.image, cg.image, cb.image
    else:
        if not (r_path and g_path and b_path):
            raise ValueError("R/G/B channel paths required (no composite "
                             "in cache)")
        r_res = extract_image_resolved(r_path)
        g_res = extract_image_resolved(g_path)
        b_res = extract_image_resolved(b_path)
        r_arr = jnp.asarray(r_res.arr)
        g_arr = jnp.asarray(g_res.arr)
        b_arr = jnp.asarray(b_res.arr)
        shapes = {r_arr.shape, g_arr.shape, b_arr.shape}
        if len(shapes) > 1:
            rows = max(s[0] for s in shapes)
            cols = max(s[1] for s in shapes)
            r_arr = resample_image(r_arr, rows, cols)
            g_arr = resample_image(g_arr, rows, cols)
            b_arr = resample_image(b_arr, rows, cols)
        header = r_res.header

    filtered = filter_header(header, do_wcs, do_meta) if header else None
    write_fits_rgb(output_path, np.asarray(r_arr), np.asarray(g_arr),
                   np.asarray(b_arr), filtered, target_bitpix)
    rows, cols = np.asarray(r_arr).shape
    return {
        C.RES_OUTPUT_PATH: output_path,
        C.RES_BITPIX: target_bitpix,
        C.COPY_WCS: do_wcs,
        C.RES_COPY_METADATA: do_meta,
        C.RES_FILE_SIZE_BYTES: _file_size(output_path),
        C.RES_DIMENSIONS: [cols, rows],
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def _to_u16(plane01: np.ndarray) -> np.ndarray:
    # clamp-then-truncate matches the reference's `as u16` cast
    # (render/rgb.rs:72-74, grayscale.rs)
    return (np.clip(plane01, 0.0, 1.0) * 65535.0).astype(np.uint16)


def _to_u8(plane01: np.ndarray) -> np.ndarray:
    return (np.clip(plane01, 0.0, 1.0) * 255.0).astype(np.uint8)


def export_png(path: str, output_path: str, bit_depth: Optional[int] = None,
               apply_stf_stretch: Optional[bool] = None,
               shadow: Optional[float] = None,
               midtone: Optional[float] = None,
               highlight: Optional[float] = None) -> dict:
    """export/mod.rs:163 — mono/RGB PNG with user or linked auto STF."""
    t0 = Timer()
    depth = bit_depth if bit_depth is not None else 16
    do_stf = bool(apply_stf_stretch)
    user_stf = StfParams(shadow=shadow or 0.0,
                         midtone=midtone if midtone is not None else 0.5,
                         highlight=highlight if highlight is not None else 1.0)

    rgb = try_extract_rgb_resolved(path)
    if rgb is not None:
        planes = [jnp.asarray(p) for p in (rgb.r, rgb.g, rgb.b)]
        stats = [compute_image_stats(p) for p in planes]
        if do_stf:
            stretched = [apply_stf_f32(p, user_stf, s)
                         for p, s in zip(planes, stats)]
        else:
            linked = helpers.compute_linked_stf(*stats)
            stretched = [apply_stf_f32(p, linked, s)
                         for p, s in zip(planes, stats)]
        arrs = [np.asarray(p) for p in stretched]
        conv = _to_u16 if depth == 16 else _to_u8
        save_rgb_png(conv(arrs[0]), conv(arrs[1]), conv(arrs[2]),
                     output_path, depth)
        rows, cols = arrs[0].shape
        return {
            C.RES_OUTPUT_PATH: output_path, C.RES_BIT_DEPTH: depth,
            C.RES_APPLY_STF: True,
            C.RES_FILE_SIZE_BYTES: _file_size(output_path),
            C.RES_DIMENSIONS: [cols, rows],
            C.RES_ELAPSED_MS: t0.elapsed_ms(),
        }

    resolved = extract_image_resolved(path)
    img = jnp.asarray(resolved.arr)
    if do_stf:
        stats = compute_image_stats(img)
        out01 = np.asarray(apply_stf_f32(img, user_stf, stats))
    else:
        arr = np.asarray(img)
        finite = arr[np.isfinite(arr)]
        mn = float(finite.min()) if finite.size else 0.0
        mx = float(finite.max()) if finite.size else 1.0
        rng = max(mx - mn, 1e-30)
        out01 = np.where(np.isfinite(arr), np.clip((arr - mn) / rng, 0, 1),
                         0.0)
    if depth == 16:
        save_gray_png(_to_u16(out01), output_path, 16)
    else:
        save_gray_png(_to_u8(out01), output_path, 8)
    rows, cols = out01.shape
    return {
        C.RES_OUTPUT_PATH: output_path, C.RES_BIT_DEPTH: depth,
        C.RES_APPLY_STF: do_stf,
        C.RES_FILE_SIZE_BYTES: _file_size(output_path),
        C.RES_DIMENSIONS: [cols, rows],
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def export_rgb_png(output_path: str, bit_depth: Optional[int] = None,
                   shadow_r: float = 0.0, midtone_r: float = 0.5,
                   highlight_r: float = 1.0,
                   shadow_g: float = 0.0, midtone_g: float = 0.5,
                   highlight_g: float = 1.0,
                   shadow_b: float = 0.0, midtone_b: float = 0.5,
                   highlight_b: float = 1.0) -> dict:
    """Composite-cache RGB PNG export with per-channel STF."""
    t0 = Timer()
    depth = bit_depth if bit_depth is not None else 16
    er, eg, eb = helpers.load_composite_rgb()
    params = [StfParams(shadow_r, midtone_r, highlight_r),
              StfParams(shadow_g, midtone_g, highlight_g),
              StfParams(shadow_b, midtone_b, highlight_b)]
    arrs = [np.asarray(apply_stf_f32(e.image, p, e.stats))
            for e, p in zip((er, eg, eb), params)]
    conv = _to_u16 if depth == 16 else _to_u8
    save_rgb_png(conv(arrs[0]), conv(arrs[1]), conv(arrs[2]), output_path,
                 depth)
    rows, cols = arrs[0].shape
    return {
        C.RES_OUTPUT_PATH: output_path, C.RES_BIT_DEPTH: depth,
        C.RES_FILE_SIZE_BYTES: _file_size(output_path),
        C.RES_DIMENSIONS: [cols, rows],
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }


def export_zip_bundle(file_paths, zip_path: str,
                      progress_cb=None) -> dict:
    """Bundle exported artifacts into an uncompressed ZIP.

    Reference behavior: src/hooks/useZipExport.ts — collects the done
    files' rendered PNGs into a JSZip archive with STORE compression
    (no deflate), renaming *.fits → *.png, skipping unreadable entries,
    and reporting progress 0–90 over files + 90–100 over the write.
    Here any artifact list zips server-side; `progress_cb(pct)` mirrors
    the hook's progress points.
    """
    import zipfile

    t0 = Timer()
    names_seen = set()
    written = []
    skipped = []
    with zipfile.ZipFile(zip_path, "w",
                         compression=zipfile.ZIP_STORED) as zf:
        n = max(len(file_paths), 1)
        for i, path in enumerate(file_paths):
            base = os.path.basename(path)
            if base.lower().endswith((".fits", ".fit")):
                base = os.path.splitext(base)[0] + ".png"
            name = base
            k = 1
            while name in names_seen:
                stem, ext = os.path.splitext(base)
                name = f"{stem}_{k}{ext}"
                k += 1
            try:
                zf.write(path, arcname=name)
                names_seen.add(name)
                written.append(name)
            except OSError:
                skipped.append(path)
            if progress_cb is not None:
                progress_cb(round((i + 1) / n * 90))
    if progress_cb is not None:
        progress_cb(100)
    return {
        C.RES_PATH: zip_path,
        "files": written,
        "skipped": skipped,
        C.RES_ELAPSED_MS: t0.elapsed_ms(),
    }
