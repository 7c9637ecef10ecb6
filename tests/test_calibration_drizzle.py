"""Calibration masters, drizzle, bicubic resample tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from astroburst_tpu.dtypes import DrizzleConfig, DrizzleKernel
from astroburst_tpu.imaging.resample import (compute_wcs_updates,
                                             resample_image)
from astroburst_tpu.io import write_fits_mono
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.stacking.calibration import (CalibrationConfig,
                                                 calibrate_image,
                                                 create_master_bias,
                                                 create_master_flat,
                                                 median_combine)
from astroburst_tpu.stacking.drizzle import drizzle_stack


def test_median_combine_rejects_nan():
    stack = np.full((5, 3, 3), 2.0, np.float32)
    stack[0, 1, 1] = np.nan
    stack[1, 1, 1] = 4.0
    out = np.asarray(median_combine(jnp.asarray(stack)))
    assert out[1, 1] == pytest.approx(2.0)  # 4 values: 2,2,2,4 → idx 2 = 2
    assert out[0, 0] == pytest.approx(2.0)


def test_calibrate_image_full_chain():
    raw = np.full((4, 4), 100.0, np.float32)
    bias = np.full((4, 4), 10.0, np.float32)
    dark = np.full((4, 4), 20.0, np.float32)
    flat = np.full((4, 4), 2.0, np.float32)
    out = np.asarray(calibrate_image(raw, CalibrationConfig(
        master_bias=jnp.asarray(bias), master_dark=jnp.asarray(dark),
        master_flat=jnp.asarray(flat), dark_exposure_ratio=0.5)))
    # (100 - 10 - 0.5*20) / 2 = 40
    np.testing.assert_allclose(out, 40.0, atol=1e-5)


def test_calibrate_clamps_negative():
    raw = np.full((2, 2), 5.0, np.float32)
    bias = np.full((2, 2), 10.0, np.float32)
    out = np.asarray(calibrate_image(raw, CalibrationConfig(
        master_bias=jnp.asarray(bias))))
    assert (out == 0.0).all()


def test_calibrate_flat_guard():
    raw = np.full((2, 2), 10.0, np.float32)
    flat = np.array([[1e-6, 2.0], [np.nan, 0.5]], np.float32)
    out = np.asarray(calibrate_image(raw, CalibrationConfig(
        master_flat=jnp.asarray(flat))))
    assert out[0, 0] == 10.0   # tiny flat → untouched
    assert out[0, 1] == 5.0
    assert out[1, 0] == 10.0   # NaN flat → untouched
    assert out[1, 1] == 20.0


def test_master_bias_from_files(tmp_path, rng):
    paths = []
    for i in range(5):
        d = (np.full((8, 8), 10.0) +
             rng.normal(0, 0.5, (8, 8))).astype(np.float32)
        p = str(tmp_path / f"bias{i}.fits")
        write_fits_mono(p, d)
        paths.append(p)
    master = np.asarray(create_master_bias(paths))
    np.testing.assert_allclose(master, 10.0, atol=1.0)


def test_master_flat_normalized(tmp_path, rng):
    paths = []
    for i in range(3):
        d = np.full((8, 8), 4000.0, np.float32)
        d[:, :4] = 2000.0  # vignette
        p = str(tmp_path / f"flat{i}.fits")
        write_fits_mono(p, d)
        paths.append(p)
    master = np.asarray(create_master_flat(paths))
    assert master.mean() == pytest.approx(1.0, abs=1e-3)
    assert master[0, 0] == pytest.approx(master[0, 7] / 2.0, rel=1e-3)


def _dot_frames(n=4, shape=(40, 40), scale_signal=100.0):
    """Frames with a bright dot, each shifted by known subpixel offsets."""
    base = np.full(shape, 10.0, np.float32)
    frames = [base.copy()]
    frames[0][20, 20] = scale_signal
    shifts = [(0.0, 0.0)]
    for k in range(1, n):
        f = base.copy()
        f[20 + k, 20 - k] = scale_signal
        frames.append(f)
        shifts.append((float(k), float(-k)))
    return frames, shifts


def test_drizzle_no_align_upscales():
    frames = [np.full((16, 16), 5.0, np.float32) for _ in range(3)]
    res = drizzle_stack(frames, DrizzleConfig(scale=2.0, align=False))
    assert res.output_dims == (32, 32)
    img = np.asarray(res.image)
    # interior flux preserved under square kernel
    np.testing.assert_allclose(img[4:-4, 4:-4], 5.0, atol=1e-3)
    assert np.asarray(res.weight_map)[16, 16] > 0


def test_drizzle_alignment_recovers_dot():
    frames, shifts = _dot_frames()
    res = drizzle_stack(frames, DrizzleConfig(scale=2.0, align=True,
                                              sigma_iterations=2))
    img = np.asarray(res.image)
    # the dot should land at ~ (40, 40) in 2x output
    peak = np.unravel_index(img.argmax(), img.shape)
    assert abs(peak[0] - 40) <= 2 and abs(peak[1] - 40) <= 2
    # recovered offsets near the truth
    for (edy, edx), (dy, dx) in zip(
            [(0, 0), (1, -1), (2, -2), (3, -3)],
            [(o[1], o[0]) for o in res.offsets]):
        assert abs(dy - edy) < 0.6
        assert abs(dx - edx) < 0.6


def test_drizzle_gaussian_kernel_runs():
    frames = [np.full((16, 16), 3.0, np.float32) for _ in range(2)]
    res = drizzle_stack(frames, DrizzleConfig(scale=1.5, align=False,
                                              kernel=DrizzleKernel.GAUSSIAN))
    assert np.asarray(res.image).max() > 0


def test_drizzle_dimension_tolerance():
    from astroburst_tpu.errors import InvalidInput
    a = np.ones((100, 100), np.float32)
    b = np.ones((80, 100), np.float32)
    with pytest.raises(InvalidInput):
        drizzle_stack([a, b], DrizzleConfig())


def test_resample_identity():
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    out = resample_image(img, 16, 16)
    np.testing.assert_array_equal(np.asarray(out), img)


def test_resample_downscale_smooths(rng):
    img = rng.random((32, 32)).astype(np.float32)
    out = np.asarray(resample_image(img, 16, 16))
    assert out.shape == (16, 16)
    assert out.mean() == pytest.approx(img.mean(), abs=0.02)


def test_resample_matches_reference_sampler(rng):
    from tests.test_resample import np_bicubic_sample
    img = rng.random((12, 10)).astype(np.float32)
    out = np.asarray(resample_image(img, 7, 9))
    scale_y, scale_x = 12 / 7, 10 / 9
    for ty in range(7):
        sy = ty * scale_y + (scale_y - 1) * 0.5
        for tx in range(9):
            sx = tx * scale_x + (scale_x - 1) * 0.5
            assert out[ty, tx] == pytest.approx(
                np_bicubic_sample(img, sy, sx), abs=2e-5), (ty, tx)


def test_wcs_updates_on_resample():
    hdr = HduHeader([("CRPIX1", "100.0"), ("CRPIX2", "50.0"),
                     ("CD1_1", "0.001"), ("CD2_2", "0.001")])
    updates = dict(compute_wcs_updates(hdr, (200, 400), (100, 200)))
    assert updates["CRPIX1"] == pytest.approx((100.0 - 0.5) / 2.0 + 0.5)
    assert updates["CD1_1"] == pytest.approx(0.002)
    assert updates["NAXIS1"] == 200.0
