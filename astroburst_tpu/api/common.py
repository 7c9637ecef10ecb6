"""Shared command plumbing: cached loaders, input resolution.

Reference: src-tauri/src/cmd/common.rs — cached loaders
(load_cached/load_cached_full), ZIP/ASDF-transparent resolution,
JWST calibration-reference ASDF rejection (common.rs:30-56), preview
caps.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

from astroburst_tpu import io as aio
from astroburst_tpu.dtypes import ImageStats
from astroburst_tpu.errors import InvalidInput
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.ops.stats import compute_image_stats
from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE, CacheEntry

MAX_PREVIEW_DIM = 4096       # common.rs:16
MAX_RAW_PREVIEW_DIM = 2048   # io/mod.rs:178

# JWST calibration-reference ASDF files are not images (common.rs:30-56)
CALIB_PATTERNS = (
    "distortion", "filteroffset", "sirskernel", "photom",
    "flat", "dark", "bias", "readnoise", "gain", "linearity",
    "saturation", "superbias", "ipc", "area", "specwcs",
    "regions", "wavelengthrange", "trappars", "mask",
)


def reject_calibration_asdf(path: str) -> None:
    if not path.lower().endswith(".asdf"):
        return
    name = os.path.basename(path).lower()
    for pat in CALIB_PATTERNS:
        if pat in name:
            raise InvalidInput(
                f"'{os.path.basename(path)}' looks like a JWST calibration "
                f"reference file ({pat}), not an image")


@dataclass
class ResolvedImage:
    arr: np.ndarray
    header: HduHeader


def extract_image_resolved(path: str) -> ResolvedImage:
    """ZIP/dir/ASDF-transparent single image extraction (common.rs:75-90)."""
    resolved = aio.resolve_single_image(path)
    reject_calibration_asdf(resolved)
    if resolved.lower().endswith(".asdf"):
        from astroburst_tpu.io.asdf import extract_image_from_asdf
        asdf_img = extract_image_from_asdf(resolved)
        return ResolvedImage(asdf_img.image, asdf_img.header)
    fi = aio.extract_image(resolved)
    return ResolvedImage(fi.image, fi.header)


def try_extract_rgb_resolved(path: str):
    resolved = aio.resolve_single_image(path)
    if resolved.lower().endswith(".asdf"):
        return None
    return aio.try_extract_rgb(resolved)


def _attach_stats(key: str, entry: CacheEntry) -> CacheEntry:
    """Fill entry.stats through the cache's lock-protected upgrade path
    so concurrent callers agree on one ImageStats. If the entry was
    evicted meanwhile it is no longer shared and a direct assignment is
    safe."""
    if entry.stats is None:
        stats = compute_image_stats(entry.image)
        GLOBAL_IMAGE_CACHE.upgrade_stats(key, stats)
        if entry.stats is None:
            entry.stats = stats
    return entry


def load_cached(path: str) -> CacheEntry:
    """Device-array cache lookup keyed by path; computes stats on miss
    (common.rs:124-150)."""
    entry = GLOBAL_IMAGE_CACHE.get(path)
    if entry is not None and entry.stats is not None:
        return entry
    if entry is None:
        resolved = extract_image_resolved(path)
        entry = GLOBAL_IMAGE_CACHE.insert(path, resolved.arr,
                                          header=resolved.header)
    return _attach_stats(path, entry)


def load_cached_many(paths, depth: int = 2):
    """load_cached over a path list with host decode pipelined ahead
    of device stats (io.prefetch pattern): uncached files decode on a
    bounded thread pool while earlier entries' stats dispatch. Returns
    entries in input order; cache semantics identical to load_cached.
    """
    import concurrent.futures as cf

    paths = list(paths)
    cached = {p: GLOBAL_IMAGE_CACHE.get(p) for p in paths}
    to_load = [p for p in paths if cached[p] is None
               or cached[p].stats is None]
    results = {}
    if to_load:
        with cf.ThreadPoolExecutor(max_workers=max(depth, 1)) as pool:
            futs = {p: pool.submit(extract_image_resolved, p)
                    for p in dict.fromkeys(to_load)}
            for p in to_load:
                resolved = futs[p].result()
                entry = GLOBAL_IMAGE_CACHE.insert(p, resolved.arr,
                                                  header=resolved.header)
                results[p] = _attach_stats(p, entry)
    return [results.get(p) or cached[p] for p in paths]


def load_cached_full(path: str) -> CacheEntry:
    """Like load_cached but guarantees a header is attached."""
    entry = GLOBAL_IMAGE_CACHE.get(path)
    if entry is not None and entry.stats is not None and entry.header is not None:
        return entry
    resolved = extract_image_resolved(path)
    entry = GLOBAL_IMAGE_CACHE.insert(path, resolved.arr, header=resolved.header)
    return _attach_stats(path, entry)


def load_many_from_cache_or_disk(keys_or_paths, depth: int = 2):
    """load_from_cache_or_disk over a list, disk misses decoded on a
    bounded thread pool (see load_cached_many). Order preserved."""
    out = {}
    disk = []
    for p in keys_or_paths:
        if p in out:
            continue
        entry = GLOBAL_IMAGE_CACHE.get(p)
        if entry is not None:
            out[p] = _attach_stats(p, entry)
        elif p.startswith("__"):
            from astroburst_tpu.errors import CacheMiss
            raise CacheMiss(f"cache key not found: {p}")
        else:
            disk.append(p)
    if disk:
        for p, entry in zip(disk, load_cached_many(disk, depth)):
            out[p] = entry
    return [out[p] for p in keys_or_paths]


def load_from_cache_or_disk(key_or_path: str) -> CacheEntry:
    """Accept a pinned cache key or a filesystem path (common.rs:124-150)."""
    entry = GLOBAL_IMAGE_CACHE.get(key_or_path)
    if entry is not None:
        return _attach_stats(key_or_path, entry)
    if key_or_path.startswith("__"):
        from astroburst_tpu.errors import CacheMiss
        raise CacheMiss(f"cache key not found: {key_or_path}")
    return load_cached(key_or_path)


class Timer:
    def __init__(self):
        self.t0 = time.monotonic()

    def elapsed_ms(self) -> int:
        return int((time.monotonic() - self.t0) * 1000)


def png_path_for(path: str, output_dir: str, suffix: str = "") -> str:
    stem = os.path.splitext(os.path.basename(path))[0] or "output"
    if suffix:
        stem = f"{stem}_{suffix}"
    return os.path.join(output_dir, f"{stem}.png")
