"""Window functions (reference: src-tauri/src/math/window.rs).

Generated on host in f64, delivered as device f32 constants.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def hann_periodic(n: int) -> np.ndarray:
    """0.5·(1 − cos(2πi/n)) (window.rs:3-18)."""
    if n == 0:
        return np.zeros(0, np.float32)
    if n == 1:
        return np.ones(1, np.float32)
    i = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


@lru_cache(maxsize=None)
def hann_symmetric(n: int) -> np.ndarray:
    """0.5·(1 − cos(2πi/(n−1))) (window.rs:20-34)."""
    if n == 0:
        return np.zeros(0, np.float32)
    if n == 1:
        return np.ones(1, np.float32)
    i = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / max(n - 1, 1)))).astype(
        np.float32)


@lru_cache(maxsize=None)
def tukey(n: int, alpha: float = 0.5) -> np.ndarray:
    """Tapered cosine: flat middle, cosine lobes of width alpha·n/2."""
    if n == 0:
        return np.zeros(0, np.float32)
    if n == 1 or alpha <= 0:
        return np.ones(n, np.float32)
    alpha = min(alpha, 1.0)
    i = np.arange(n, dtype=np.float64)
    edge = alpha * (n - 1) / 2.0
    w = np.ones(n)
    left = i < edge
    w[left] = 0.5 * (1.0 + np.cos(np.pi * (i[left] / edge - 1.0)))
    right = i > (n - 1) - edge
    w[right] = 0.5 * (1.0 + np.cos(np.pi * ((i[right] - (n - 1) + edge) / edge)))
    return w.astype(np.float32)


@lru_cache(maxsize=None)
def cosine_bell(n: int) -> np.ndarray:
    """sin(π·i/(n−1)) bell."""
    if n == 0:
        return np.zeros(0, np.float32)
    if n == 1:
        return np.ones(1, np.float32)
    i = np.arange(n, dtype=np.float64)
    return np.sin(np.pi * i / (n - 1)).astype(np.float32)


def generate_window(kind: str, n: int) -> np.ndarray:
    """Window by name (window.rs:89 generate_window)."""
    k = (kind or "hann").lower()
    if k in ("hann", "hanning"):
        return hann_periodic(n)
    if k == "hann_symmetric":
        return hann_symmetric(n)
    if k == "tukey":
        return tukey(n)
    if k in ("cosine", "cosine_bell"):
        return cosine_bell(n)
    if k in ("none", "rect", "boxcar"):
        return np.ones(n, np.float32)
    raise ValueError(f"unknown window kind: {kind}")
