"""Pipelined ingest: host decode overlapping device compute.

The reference decodes with rayon inside each blocking command
(infra/fits/reader.rs:42-101) — decode and compute serialize per file.
Here a bounded thread pool runs mmap+decode (and `jax.device_put`,
which is async under JAX's dispatch model) a configurable `depth`
ahead of the consumer, so the chip is never starved by host IO during
multi-file stacking/calibration loops.

Usage::

    for frame, header in prefetch_images(paths, depth=2):
        accumulate(frame)   # device work overlaps the next decode
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np


def _default_load(path: str):
    from astroburst_tpu.io.dispatcher import resolve_single_image
    from astroburst_tpu.io.fits_reader import extract_image
    from astroburst_tpu.io import asdf as asdf_io

    resolved = resolve_single_image(path)
    if resolved.lower().endswith((".asdf",)):
        img = asdf_io.extract_image_from_asdf(resolved)
    else:
        img = extract_image(resolved)
    return img


def prefetch_images(paths: Sequence[str], depth: int = 2,
                    loader: Optional[Callable] = None,
                    to_device: bool = True) -> Iterator:
    """Yield loaded images in order, decoding up to `depth` ahead.

    `loader(path)` must return an object with a `.image` ndarray (the
    default handles FITS/ASDF/ZIP members via the dispatcher). With
    `to_device`, pixels are replaced by a device array — device_put is
    issued on the worker thread so the H2D copy also overlaps.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    load = loader or _default_load

    def work(path):
        img = load(path)
        if to_device and hasattr(img, "image"):
            img.image = jax.device_put(np.asarray(img.image))
        return img

    with cf.ThreadPoolExecutor(max_workers=depth) as pool:
        pending: List[cf.Future] = []
        it = iter(paths)
        try:
            for _ in range(depth):
                pending.append(pool.submit(work, next(it)))
        except StopIteration:
            pass
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(pool.submit(work, next(it)))
            except StopIteration:
                pass
            yield fut.result()


class PrefetchingStackLoader:
    """Decode N frames into a device-resident [N, H, W] stack with
    host decode, H2D copies and any per-frame device preprocessing all
    pipelined. Frames are cropped to the common minimum dims the way
    the stacker does (core/stacking/combine.rs:94-113)."""

    def __init__(self, depth: int = 2,
                 preprocess: Optional[Callable] = None):
        self.depth = depth
        self.preprocess = preprocess

    def load_stack(self, paths: Sequence[str]):
        frames = []
        headers = []
        for img in prefetch_images(paths, depth=self.depth):
            px = img.image
            if self.preprocess is not None:
                px = self.preprocess(px)
            frames.append(px)
            headers.append(getattr(img, "header", None))
        if not frames:
            raise ValueError("no input frames")
        import jax.numpy as jnp
        min_r = min(int(f.shape[0]) for f in frames)
        min_c = min(int(f.shape[1]) for f in frames)
        stack = jnp.stack([f[:min_r, :min_c] for f in frames])
        return stack, headers
