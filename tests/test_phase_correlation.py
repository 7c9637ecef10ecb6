"""Phase correlation tests mirroring the reference's
(phase_correlation.rs:171-240) plus a coarse-to-fine case."""

import numpy as np
import pytest

from astroburst_tpu.alignment import phase_correlate


def make_pattern(rows, cols, seed=7):
    """Broadband star-field-like pattern: Gaussian spots + noise.

    (The reference's test pattern — smooth global sinusoids — is
    near-periodic; whitened phase correlation on such a pattern has
    ambiguous sidelobe peaks under any FFT library. Real astro frames
    are broadband, which is what this models.)
    """
    rng = np.random.default_rng(seed)
    img = rng.normal(100.0, 3.0, (rows, cols)).astype(np.float32)
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    for _ in range(40):
        sy, sx = rng.random(2) * [rows - 20, cols - 20] + 10
        amp = 200.0 + rng.random() * 800.0
        img += amp * np.exp(-((yy - sy) ** 2 + (xx - sx) ** 2) / 4.0)
    return img.astype(np.float32)


def shift_array(img, dy, dx):
    rows, cols = img.shape
    out = np.zeros_like(img)
    ys = np.arange(rows) - dy
    xs = np.arange(cols) - dx
    yv = (ys >= 0) & (ys < rows)
    xv = (xs >= 0) & (xs < cols)
    out[np.ix_(yv, xv)] = img[np.ix_(ys[yv], xs[xv])]
    return out


def test_identical_images():
    img = make_pattern(128, 128)
    r = phase_correlate(img, img)
    assert abs(r.dx) < 0.5
    assert abs(r.dy) < 0.5


def test_known_integer_shift():
    img = make_pattern(256, 256)
    shifted = shift_array(img, 10, -5)
    r = phase_correlate(img, shifted)
    assert abs(r.dx - (-5.0)) < 1.0
    assert abs(r.dy - 10.0) < 1.0


def test_subpixel_confidence_positive():
    img = make_pattern(128, 128)
    r = phase_correlate(img, shift_array(img, 3, 2))
    assert r.confidence > 2.0  # clean synthetic shift is high confidence


def test_nan_no_panic():
    img = make_pattern(64, 64)
    img[10, 10] = np.nan
    img[20, 30] = np.inf
    img[5, 5] = -np.inf
    r = phase_correlate(img, img)
    assert np.isfinite(r.dx) and np.isfinite(r.dy)


def test_constant_image():
    img = np.full((64, 64), 100.0, np.float32)
    r = phase_correlate(img, img)
    assert r.dx == 0.0 and r.dy == 0.0 and r.confidence == 0.0


def test_mismatched_dims_cropped():
    img = make_pattern(128, 128)
    r = phase_correlate(img, shift_array(img, 4, 4)[:120, :100])
    assert abs(r.dy - 4.0) < 1.5
    assert abs(r.dx - 4.0) < 1.5


def test_coarse_to_fine_large_image():
    img = make_pattern(700, 640)  # > 512 → coarse-to-fine path
    shifted = shift_array(img, 17, -23)
    r = phase_correlate(img, shifted)
    assert abs(r.dy - 17.0) < 1.0
    assert abs(r.dx - (-23.0)) < 1.0
