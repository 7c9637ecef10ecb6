"""Subpixel shift and area downsample vs numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.ops.resample import (area_downsample, catmull_rom,
                                         shift_bicubic)


def np_catmull_rom(t):
    a = abs(t)
    if a <= 1.0:
        return a * a * (1.5 * a - 2.5) + 1.0
    if a <= 2.0:
        return a * (a * (2.5 - 0.5 * a) - 4.0) + 2.0
    return 0.0


def np_bicubic_sample(img, y, x):
    """Direct port of sampling.rs:52-81 (clamped taps)."""
    rows, cols = img.shape
    iy, ix = int(np.floor(y)), int(np.floor(x))
    fy, fx = y - iy, x - ix
    wx = [np_catmull_rom(fx + 1.0), np_catmull_rom(fx),
          np_catmull_rom(fx - 1.0), np_catmull_rom(fx - 2.0)]
    val = 0.0
    for j in range(4):
        r = min(max(iy + j - 1, 0), rows - 1)
        row_val = sum(float(img[r, min(max(ix + i - 1, 0), cols - 1)]) * wx[i]
                      for i in range(4))
        val += row_val * np_catmull_rom(fy - (j - 1))
    return np.float32(val)


def np_shift(img, dy, dx):
    """Port of align.rs:36-57."""
    rows, cols = img.shape
    out = np.zeros_like(img)
    for y in range(rows):
        for x in range(cols):
            sy, sx = y + dy, x + dx
            if sy < -0.5 or sy > rows - 0.5 or sx < -0.5 or sx > cols - 0.5:
                continue
            out[y, x] = np_bicubic_sample(img, sy, sx)
    return out


def test_catmull_rom_values():
    ts = np.linspace(-2.5, 2.5, 21)
    got = np.asarray(catmull_rom(jnp.asarray(ts, dtype=jnp.float32)))
    ref = [np_catmull_rom(t) for t in ts]
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("dy,dx", [(0.0, 0.0), (1.0, -2.0), (0.3, 0.7),
                                   (-1.25, 2.5), (5.6, -3.2)])
def test_shift_bicubic_matches_reference(dy, dx, rng):
    img = rng.random((12, 14)).astype(np.float32)
    got = np.asarray(shift_bicubic(jnp.asarray(img), dy, dx))
    ref = np_shift(img, dy, dx)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_shift_identity(rng):
    img = rng.random((8, 8)).astype(np.float32)
    got = np.asarray(shift_bicubic(jnp.asarray(img), 0.0, 0.0))
    np.testing.assert_array_equal(got, img)


def test_area_downsample_integer_ratio(rng):
    img = rng.random((16, 16)).astype(np.float32)
    out = np.asarray(area_downsample(jnp.asarray(img), 8, 8))
    ref = img.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_area_downsample_nan_aware():
    img = np.ones((4, 4), np.float32)
    img[0, 0] = np.nan
    out = np.asarray(area_downsample(jnp.asarray(img), 2, 2))
    np.testing.assert_allclose(out, 1.0, atol=1e-6)  # NaN excluded from box


def test_area_downsample_noninteger_ratio(rng):
    img = rng.random((10, 7)).astype(np.float32)
    out = np.asarray(area_downsample(jnp.asarray(img), 4, 3))
    assert out.shape == (4, 3)
    # spot-check one box against downsample.rs boundaries
    y0, y1 = 0, int(np.ceil(10 / 4))  # rows 0..3
    x0, x1 = 0, int(np.ceil(7 / 3))   # cols 0..3
    np.testing.assert_allclose(out[0, 0], img[y0:y1, x0:x1].mean(), rtol=1e-5)
