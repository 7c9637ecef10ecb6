"""process_rgb, drizzle RGB, batch pipeline, tile pyramid, SPCC tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from astroburst_tpu.astrometry.spcc import SpccConfig, spcc_calibrate_rgb
from astroburst_tpu.compose.drizzle_rgb import (DrizzleRgbConfig,
                                                process_drizzle_rgb)
from astroburst_tpu.compose.rgb import (ProcessedRgb, harmonize_dimensions,
                                        process_rgb)
from astroburst_tpu.dtypes import (RgbComposeConfig, ScnrConfig, ScnrMethod,
                                   WhiteBalance, WhiteBalanceMode)
from astroburst_tpu.errors import InvalidInput
from astroburst_tpu.imaging.calibration_pipeline import (BatchStackConfig,
                                                         ChannelInput,
                                                         run_batch_pipeline)
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.render.tiles import (TileParams, compute_num_levels,
                                         downsample_2x, generate_tile_pyramid)


def _chan(shape=(64, 64), level=0.2, seed=0, stars=True):
    rng = np.random.default_rng(seed)
    img = rng.normal(level, 0.01, shape).astype(np.float32)
    if stars:
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
        for cy, cx in [(20, 20), (40, 50), (50, 14)]:
            img += 0.8 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    return np.abs(img).astype(np.float32)


@pytest.mark.slow
def test_process_rgb_basic():
    r = _chan(level=0.3, seed=1)
    g = _chan(level=0.2, seed=2)
    b = _chan(level=0.1, seed=3)
    out = process_rgb(r, g, b, RgbComposeConfig(align=False))
    assert out.rows == 64 and out.cols == 64
    # stretched output in [0,1]
    for p in (out.r, out.g, out.b):
        arr = np.asarray(p)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
    # linked STF: identical params across channels
    assert out.stf_r == out.stf_g == out.stf_b
    assert out.pre_stretch_r is not None


def test_process_rgb_requires_two_channels():
    with pytest.raises(InvalidInput):
        process_rgb(_chan(), None, None)


@pytest.mark.slow
def test_process_rgb_synthesizes_missing_channel():
    r = _chan(level=0.3, seed=1)
    g = _chan(level=0.2, seed=2)
    out = process_rgb(r, g, None, RgbComposeConfig(align=False))
    # B = mean(R, G) before WB/stretch → stats between the two
    assert out.stats_b.median == pytest.approx(
        (out.stats_r.median + out.stats_g.median) / 2, rel=0.1)


@pytest.mark.slow
def test_process_rgb_alignment_recovers_offset():
    r = _chan(shape=(128, 128), level=0.3, seed=4)
    g = np.roll(r, (3, -2), axis=(0, 1)) * 0.7
    out = process_rgb(r, g, r * 0.5,
                      RgbComposeConfig(align=True))
    assert out.offset_g[0] == pytest.approx(3.0, abs=0.5)
    assert out.offset_g[1] == pytest.approx(-2.0, abs=0.5)


@pytest.mark.slow
def test_process_rgb_scnr():
    r = _chan(level=0.2, seed=5, stars=False)
    g = _chan(level=0.6, seed=6, stars=False)
    b = _chan(level=0.2, seed=7, stars=False)
    out = process_rgb(r, g, b, RgbComposeConfig(
        align=False, white_balance=WhiteBalance(mode=WhiteBalanceMode.NONE),
        scnr=ScnrConfig(ScnrMethod.AVERAGE_NEUTRAL, 1.0, False)))
    assert out.scnr_applied
    g_out = np.asarray(out.g)
    r_out = np.asarray(out.r)
    b_out = np.asarray(out.b)
    assert (g_out <= np.maximum((r_out + b_out) / 2, g_out - 1e-6) + 1e-4).all()


def test_harmonize_dimensions_resamples():
    r = np.ones((64, 64), np.float32)
    g = np.ones((32, 32), np.float32)
    ro, go, bo, rows, cols, info = harmonize_dimensions(
        jnp.asarray(r), jnp.asarray(g), None)
    assert (rows, cols) == (64, 64)
    assert go.shape == (64, 64)
    assert info.resampled


def test_harmonize_ratio_cap():
    r = np.ones((512, 512), np.float32)
    g = np.ones((32, 32), np.float32)
    with pytest.raises(InvalidInput):
        harmonize_dimensions(jnp.asarray(r), jnp.asarray(g), None)


@pytest.mark.slow
def test_process_drizzle_rgb():
    r = _chan(level=0.4, seed=8)
    g = _chan(level=0.3, seed=9)
    b = _chan(level=0.2, seed=10)
    out = process_drizzle_rgb(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b))
    assert out.out_dims == (64, 64)
    assert np.asarray(out.r_stretched).max() <= 1.0
    assert out.stf_r == out.stf_g  # linked


def test_batch_pipeline():
    lights = [np.full((32, 32), 100.0, np.float32) +
              np.random.default_rng(i).normal(0, 1, (32, 32)).astype(
                  np.float32) for i in range(5)]
    lights[0][10, 10] = 10000.0  # cosmic ray
    res = run_batch_pipeline(
        [ChannelInput(label="Ha", lights=lights)],
        config=BatchStackConfig(normalize_before_stack=True))
    assert len(res.master_channels) == 1
    label, master = res.master_channels[0]
    assert label == "Ha"
    m = np.asarray(master)
    assert 0.0 <= m.min() and m.max() <= 1.0
    stats = res.stats["channels"][0]
    assert stats["lights_input"] == 5
    assert sum(stats["lights_after_rejection"]) >= 1  # outlier rejected


def test_tile_pyramid(tmp_path):
    img = _chan(shape=(300, 400), level=0.3, seed=11)
    pyr = generate_tile_pyramid(jnp.asarray(img), str(tmp_path / "tiles"),
                                TileParams(tile_size=128))
    assert pyr.original_width == 400
    assert pyr.levels[-1].width == 400  # finest level last
    assert pyr.levels[0].width <= 128 * pyr.levels[0].cols
    # tiles written
    assert os.path.exists(str(tmp_path / "tiles" / "0" / "0_0.png"))
    deepest = pyr.levels[-1]
    assert os.path.exists(str(
        tmp_path / "tiles" / str(deepest.level) /
        f"{deepest.cols - 1}_{deepest.rows - 1}.png"))


def test_downsample_2x_nan_aware():
    img = np.array([[1.0, np.nan], [3.0, 5.0]], np.float32)
    out = np.asarray(downsample_2x(jnp.asarray(img)))
    assert out.shape == (1, 1)
    assert out[0, 0] == pytest.approx(3.0)  # mean of finite 1,3,5


def test_compute_num_levels():
    assert compute_num_levels(200, 200, 256) == 1
    assert compute_num_levels(512, 512, 256) == 2
    assert compute_num_levels(4096, 4096, 256) == 5


def test_spcc_on_synthetic_field():
    from astroburst_tpu.synth import (FieldConfig, NoiseParams, SynthConfig,
                                      generate)
    cfg = SynthConfig(
        field=FieldConfig(width=256, height=256, n_stars=40, seed=12,
                          flux_min=5000, flux_max=30000),
        psf_fwhm=3.0,
        noise=NoiseParams(sky_background=10.0, readout_noise=1.0,
                          exposure_time=10.0, gain=1.0, bias_level=50.0))
    noisy, _, _ = generate(cfg)
    base = np.asarray(noisy)
    r, g, b = base * 1.2, base, base * 0.8
    header = HduHeader([("CRPIX1", "128"), ("CRPIX2", "128"),
                        ("CRVAL1", "150.0"), ("CRVAL2", "30.0"),
                        ("CD1_1", "-0.0002"), ("CD1_2", "0"),
                        ("CD2_1", "0"), ("CD2_2", "0.0002"),
                        ("CTYPE1", "'RA---TAN'")])
    res = spcc_calibrate_rgb(r, g, b, header, SpccConfig(min_snr=10.0))
    assert res.stars_matched >= 3
    assert res.g_factor == 1.0
    assert res.is_synthetic_catalog
    assert 0.1 < res.r_factor < 10.0
    # r channel was boosted → correction should push it down vs b
    assert res.r_factor < res.b_factor * 1.2 / 0.8


def test_spcc_requires_wcs():
    r = _chan()
    with pytest.raises(InvalidInput):
        spcc_calibrate_rgb(r, r, r, HduHeader([]))
