"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("frames", "rows"),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the first n devices.

    Default layout is 2D (frames × rows): the frame axis carries
    data-parallel per-exposure work (align, decode, subframe metrics),
    the row axis carries spatially-sharded reductions and stencils.
    With no `shape`, all devices go to the frame axis.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)
