"""RL deconvolution, wavelet, background, power spectrum tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.analysis.deconvolution import (RLResult,
                                                   generate_gaussian_psf,
                                                   richardson_lucy)
from astroburst_tpu.analysis.fft import compute_power_spectrum
from astroburst_tpu.dtypes import RLConfig
from astroburst_tpu.imaging.background import (BackgroundConfig,
                                               extract_background)
from astroburst_tpu.imaging.wavelet import (WaveletConfig, atrous_smooth,
                                            wavelet_denoise)


def test_gaussian_psf_normalized():
    psf = generate_gaussian_psf(15, 2.0)
    assert psf.sum() == pytest.approx(1.0, abs=1e-5)
    assert psf[7, 7] == psf.max()


def _blurred_star_image(sigma=2.0, shape=(64, 64)):
    rng = np.random.default_rng(0)
    truth = np.zeros(shape, np.float32)
    truth[32, 32] = 100.0
    truth[20, 44] = 60.0
    psf = generate_gaussian_psf(15, sigma)
    from scipy.signal import fftconvolve
    blurred = fftconvolve(truth, psf, mode="same").astype(np.float32)
    blurred += rng.normal(0, 0.01, shape).astype(np.float32)
    return np.clip(blurred, 0, None), truth, psf


def test_richardson_lucy_sharpens():
    blurred, truth, psf = _blurred_star_image()
    res = richardson_lucy(blurred, psf, RLConfig(iterations=25, dering=False))
    out = np.asarray(res.image)
    # peak concentration increases after deconvolution
    assert out[32, 32] > blurred[32, 32] * 1.5
    assert res.iterations_run >= 3
    assert np.isfinite(res.convergence)


def test_richardson_lucy_deringing_clamps():
    blurred, truth, psf = _blurred_star_image()
    res = richardson_lucy(blurred, psf,
                          RLConfig(iterations=10, dering=True,
                                   dering_threshold=0.1))
    out = np.asarray(res.image)
    upper = blurred * 1.1 + 1e-4
    assert (out <= upper).all()


def test_richardson_lucy_flux_sane():
    blurred, truth, psf = _blurred_star_image()
    res = richardson_lucy(blurred, psf, RLConfig(iterations=15, dering=False))
    out = np.asarray(res.image)
    assert out.sum() == pytest.approx(blurred.sum(), rel=0.1)
    assert (out >= 0).all()


def test_atrous_smooth_constant_preserved():
    x = jnp.full((32, 32), 5.0, jnp.float32)
    out = np.asarray(atrous_smooth(x, 1))
    np.testing.assert_allclose(out, 5.0, atol=1e-5)


def test_atrous_smooth_matches_reference_loop(rng):
    """Direct port of atrous_smooth_buffers with clamped taps."""
    img = rng.random((12, 10)).astype(np.float32)
    step = 2
    k = [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]
    h = np.zeros_like(img)
    for y in range(12):
        for x in range(10):
            h[y, x] = sum(kv * img[y, min(max(x + (ki - 2) * step, 0), 9)]
                          for ki, kv in enumerate(k))
    ref = np.zeros_like(img)
    for y in range(12):
        for x in range(10):
            ref[y, x] = sum(kv * h[min(max(y + (ki - 2) * step, 0), 11), x]
                            for ki, kv in enumerate(k))
    got = np.asarray(atrous_smooth(jnp.asarray(img), step))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_wavelet_denoise_reduces_noise():
    rng = np.random.default_rng(1)
    clean = np.zeros((64, 64), np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    clean += 10.0 * np.exp(-((yy - 32) ** 2 + (xx - 32) ** 2) / 100.0)
    noisy = clean + rng.normal(0, 0.5, clean.shape).astype(np.float32) + 2.0
    res = wavelet_denoise(noisy, WaveletConfig(num_scales=4))
    out = np.asarray(res.denoised)
    assert res.noise_estimate == pytest.approx(0.5, rel=0.4)
    resid_before = np.std(noisy - clean - 2.0)
    resid_after = np.std(out - clean - 2.0)
    assert resid_after < resid_before
    assert (out >= 0).all()


def test_wavelet_preserves_structure():
    img = np.zeros((64, 64), np.float32) + 1.0
    img[30:34, 30:34] = 50.0
    res = wavelet_denoise(img, WaveletConfig(num_scales=3))
    out = np.asarray(res.denoised)
    assert out[31, 31] > 25.0  # bright feature survives


def test_background_subtract_flattens_gradient():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    gradient = 1.0 + 0.01 * yy + 0.005 * xx
    img = gradient + rng.normal(0, 0.01, (128, 128)).astype(np.float32)
    res = extract_background(img, BackgroundConfig(grid_size=8, poly_degree=2))
    corrected = np.asarray(res.corrected)
    # gradient removed: row means roughly constant
    row_means = corrected.mean(axis=1)
    assert row_means.std() < 0.02
    assert res.sample_count >= 30
    assert res.rms_residual < 0.05
    model = np.asarray(res.model)
    np.testing.assert_allclose(model, gradient, atol=0.05)


def test_background_divide_mode():
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    vignette = 2.0 - 0.00005 * ((yy - 48) ** 2 + (xx - 48) ** 2)
    img = vignette * 3.0
    res = extract_background(img, BackgroundConfig(grid_size=6, poly_degree=2,
                                                   mode="divide"))
    corrected = np.asarray(res.corrected)
    assert corrected.std() / corrected.mean() < 0.02


def test_background_too_small_image():
    from astroburst_tpu.errors import InvalidInput
    with pytest.raises(InvalidInput):
        extract_background(np.ones((16, 16), np.float32),
                           BackgroundConfig(grid_size=8))


def test_power_spectrum_shape_and_peak():
    # pure sinusoid → symmetric peaks off-center
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    img = np.sin(2 * np.pi * xx * 8 / 128).astype(np.float32) + 2.0
    res = compute_power_spectrum(img, apply_window=True)
    assert res.original_size == 128
    spec = np.asarray(res.spectrum)
    assert spec.shape == (128, 128)
    center = spec[64, 64]
    peak_col = spec[64, 64 + 8]
    assert peak_col > 0.5 * center  # sinusoid line visible
    assert res.windowed


def test_power_spectrum_downsampled():
    img = np.random.default_rng(3).random((1500, 1500)).astype(np.float32)
    res = compute_power_spectrum(img)
    assert res.original_size == 2048
    assert res.display_width == 1024
