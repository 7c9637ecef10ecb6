"""Synth generators, PSF estimation, subframe metrics."""

import numpy as np
import pytest

from astroburst_tpu.analysis.subframe import (SubframeWeightConfig,
                                              analyze_subframe,
                                              normalize_weights)
from astroburst_tpu.imaging.psf_estimation import (PsfEstimationConfig,
                                                   estimate_psf,
                                                   psf_to_kernel)
from astroburst_tpu.synth import (FieldConfig, GaussianPsf, NoiseParams,
                                  SynthConfig, apply_noise, generate,
                                  generate_stack, render_stars,
                                  uniform_field, king_cluster)
from astroburst_tpu.synth.noise import generate_flat_field


def test_uniform_field_deterministic():
    cfg = FieldConfig(width=256, height=256, n_stars=50, seed=7)
    a = uniform_field(cfg)
    b = uniform_field(cfg)
    assert len(a) == 50
    assert a[0].x == b[0].x and a[10].flux == b[10].flux
    assert all(0 <= s.x < 256 and 0 <= s.y < 256 for s in a)


def test_power_law_favors_faint():
    cfg = FieldConfig(n_stars=2000, flux_min=100, flux_max=50000, seed=1)
    stars = uniform_field(cfg)
    fluxes = np.array([s.flux for s in stars])
    assert (fluxes >= 100).all() and (fluxes <= 50000).all()
    assert np.median(fluxes) < 1000  # steep power law

def test_king_cluster_concentrated():
    cfg = FieldConfig(width=512, height=512, n_stars=200, seed=3)
    stars = king_cluster(cfg, core_radius=20.0, tidal_radius=150.0)
    r = np.hypot(np.array([s.x for s in stars]) - 256,
                 np.array([s.y for s in stars]) - 256)
    assert (r <= 150.0 + 1e-6).all()
    assert np.median(r) < 75.0


def test_render_stars_flux_preserved():
    from astroburst_tpu.synth.star_field import Star
    stars = [Star(64.0, 64.0, 0.0, 1000.0, 5000.0)]
    img = np.asarray(render_stars(stars, GaussianPsf.from_fwhm(3.0), 128, 128))
    assert img.sum() == pytest.approx(1000.0, rel=1e-3)
    peak = np.unravel_index(img.argmax(), img.shape)
    assert peak == (64, 64)


def test_apply_noise_adds_bias_and_shot_noise():
    img = np.zeros((64, 64), np.float32)
    params = NoiseParams(seed=5)
    out = np.asarray(apply_noise(img, params))
    # bias/gain + sky: expected level = (sky*g*t + dark*t)/g + bias/g
    expected = (200.0 * 1.5 * 300.0 + 0.05 * 300.0 + 1000.0) / 1.5
    assert out.mean() == pytest.approx(expected, rel=0.01)
    assert out.std() > 0


def test_flat_field_vignettes():
    flat = np.asarray(generate_flat_field(128, 128, 1, 0.3))
    assert flat[64, 64] > flat[0, 0]
    assert flat.min() >= 0.01


def test_generate_stack_distinct_noise():
    cfg = SynthConfig(field=FieldConfig(width=128, height=128, n_stars=20,
                                        seed=2), n_frames=3)
    frames, gt, stars = generate_stack(cfg)
    assert len(frames) == 3
    a, b = np.asarray(frames[0]), np.asarray(frames[1])
    assert not np.allclose(a, b)
    assert np.asarray(gt).max() > 0


@pytest.mark.slow
def test_estimate_psf_recovers_fwhm():
    cfg = SynthConfig(
        field=FieldConfig(width=512, height=512, n_stars=60, seed=9,
                          flux_min=5000, flux_max=20000),
        psf_fwhm=4.0,
        noise=NoiseParams(sky_background=50.0, readout_noise=2.0,
                          exposure_time=10.0, gain=1.0, bias_level=100.0))
    noisy, gt, stars = generate(cfg)
    img = np.asarray(noisy)
    res = estimate_psf(img, PsfEstimationConfig(num_stars=20))
    assert res.kernel_size == 31
    assert res.kernel.sum() == pytest.approx(1.0, abs=1e-4)
    assert res.average_fwhm == pytest.approx(4.0, abs=1.5)
    assert len(res.stars_used) >= 5
    k = psf_to_kernel(res)
    assert k.sum() == pytest.approx(1.0, abs=1e-4)
    # kernel peak at center
    c = res.kernel_size // 2
    peak = np.unravel_index(res.kernel.argmax(), res.kernel.shape)
    assert abs(peak[0] - c) <= 1 and abs(peak[1] - c) <= 1


def test_subframe_metrics_accept_good_frame():
    cfg = SynthConfig(
        field=FieldConfig(width=256, height=256, n_stars=40, seed=4,
                          flux_min=3000, flux_max=20000),
        psf_fwhm=3.0,
        noise=NoiseParams(sky_background=20.0, readout_noise=2.0,
                          exposure_time=10.0, gain=1.0, bias_level=100.0))
    noisy, _, _ = generate(cfg)
    m = analyze_subframe(np.asarray(noisy), "/data/frame_001.fits")
    assert m.file_name == "frame_001.fits"
    assert m.star_count >= 10
    assert m.accepted
    assert m.weight > 0
    assert m.median_fwhm == pytest.approx(3.0, abs=1.5)


def test_subframe_rejects_empty_frame():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 1, (128, 128)).astype(np.float32)
    m = analyze_subframe(img, "empty.fits")
    assert not m.accepted
    assert m.weight == 0.0


def test_normalize_weights():
    cfg = SynthConfig(
        field=FieldConfig(width=256, height=256, n_stars=40, seed=4,
                          flux_min=3000, flux_max=20000),
        noise=NoiseParams(sky_background=20.0, readout_noise=2.0,
                          exposure_time=10.0, gain=1.0, bias_level=100.0))
    noisy, _, _ = generate(cfg)
    m1 = analyze_subframe(np.asarray(noisy), "a.fits")
    m2 = analyze_subframe(np.asarray(noisy) * 0.5 + 50, "b.fits")
    metrics = [m1, m2]
    normalize_weights(metrics)
    assert max(m.weight for m in metrics) == pytest.approx(1.0)
