"""End-to-end tests exercising the full command surface against the
reference's registered command list (lib.rs:116-177)."""

import os
import struct

import numpy as np
import pytest

import astroburst_tpu.api as api
from astroburst_tpu import constants as C
from astroburst_tpu.io import write_fits_mono
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE

REGISTERED_COMMANDS = [
    "process_fits", "process_fits_full", "get_raw_pixels_preview",
    "export_fits", "export_fits_rgb", "export_png", "export_rgb_png",
    "compose_rgb_cmd", "get_header", "get_full_header",
    "get_fits_extensions", "get_header_by_hdu", "detect_narrowband_filters",
    "compute_histogram", "compute_fft_spectrum", "detect_stars",
    "detect_stars_composite", "analyze_subframes_cmd", "apply_stf_render",
    "generate_tiles", "generate_tiles_rgb", "calibrate", "stack",
    "run_pipeline_cmd", "restretch_composite_cmd",
    "clear_composite_cache_cmd", "export_aligned_channels_cmd",
    "update_composite_channel_cmd", "blend_channels_cmd",
    "align_channels_cmd", "crop_channels_cmd", "calibrate_and_scnr_cmd",
    "compute_auto_wb_cmd", "reset_wb_cmd", "resample_fits_cmd",
    "deconvolve_rl_cmd", "extract_background_cmd", "wavelet_denoise_cmd",
    "apply_arcsinh_stretch_cmd", "masked_stretch_cmd",
    "arcsinh_stretch_composite_cmd", "masked_stretch_composite_cmd",
    "apply_tone_composite_cmd", "process_cube_cmd", "process_cube_lazy_cmd",
    "get_cube_info", "get_cube_frame", "get_cube_spectrum",
    "plate_solve_cmd", "get_wcs_info", "estimate_psf_cmd",
    "spcc_calibrate_cmd", "get_config", "update_config", "save_api_key",
    "get_api_key", "generate_synth_cmd", "generate_synth_stack_cmd",
    "get_output_dir_info", "cleanup_output_cmd",
]


def test_all_60_commands_present():
    missing = [c for c in REGISTERED_COMMANDS if not hasattr(api, c)]
    assert not missing, f"missing commands: {missing}"
    assert len(REGISTERED_COMMANDS) == 60


@pytest.fixture
def star_fits(tmp_path, rng):
    img = rng.normal(0.2, 0.01, (96, 96)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float64)
    for cy, cx in [(30, 30), (60, 70), (70, 20), (20, 70), (48, 48)]:
        img += 0.9 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    img = np.abs(img)
    p = str(tmp_path / "stars.fits")
    write_fits_mono(p, img, HduHeader([
        ("OBJECT", "TEST"), ("FILTER", "Ha"),
        ("CRPIX1", "48"), ("CRPIX2", "48"), ("CRVAL1", "150.0"),
        ("CRVAL2", "30.0"), ("CD1_1", "-0.0002"), ("CD1_2", "0"),
        ("CD2_1", "0"), ("CD2_2", "0.0002"), ("CTYPE1", "'RA---TAN'")]))
    return p, img


@pytest.mark.slow
def test_export_roundtrip(star_fits, tmp_path):
    p, img = star_fits
    out = api.export_fits(p, str(tmp_path / "out.fits"), bitpix=-32)
    assert out[C.RES_FILE_SIZE_BYTES] > 0
    from astroburst_tpu.io import extract_image
    re = extract_image(str(tmp_path / "out.fits"))
    np.testing.assert_allclose(re.image, img, atol=1e-6)
    assert re.header.get("OBJECT") == "TEST"


def test_export_png(star_fits, tmp_path):
    p, _ = star_fits
    out = api.export_png(p, str(tmp_path / "out.png"), bit_depth=8,
                         apply_stf_stretch=True, midtone=0.3)
    assert os.path.exists(out[C.RES_OUTPUT_PATH])
    assert out[C.RES_BIT_DEPTH] == 8


@pytest.mark.slow
def test_metadata_commands(star_fits):
    p, _ = star_fits
    h = api.get_header(p)
    assert h[C.RES_TOTAL_CARDS] > 5
    full = api.get_full_header(p)
    assert "wcs" in full[C.RES_CATEGORIES]
    assert full[C.RES_CATEGORIES]["wcs"]["CRVAL1"] == "150.0"
    assert full[C.RES_FILTER_DETECTION]["filter"].startswith("H")
    ext = api.get_fits_extensions(p)
    assert ext["extension_count"] == 1
    hdu = api.get_header_by_hdu(p, 0)
    assert hdu[C.RES_TOTAL_CARDS] > 5
    det = api.detect_narrowband_filters([p])
    assert det[C.RES_FILTERS][0][C.RES_FILTER_DETECTION] is not None


@pytest.mark.slow
def test_analysis_commands(star_fits, tmp_path):
    p, _ = star_fits
    hist = api.compute_histogram(p, bins=128)
    assert hist[C.RES_BIN_COUNT] == 128
    blob = api.compute_fft_spectrum(p)
    w, h = struct.unpack("<II", blob[:8])
    assert w * h == len(blob) - 32
    stars = api.detect_stars(p, 5.0)
    assert stars["star_count"] >= 4
    sub = api.analyze_subframes_cmd([p])
    assert sub[C.RES_FRAME_COUNT] == 1


@pytest.mark.slow
def test_visualization_commands(star_fits, tmp_path):
    p, _ = star_fits
    out = api.apply_stf_render(p, str(tmp_path / "o"), 0.01, 0.25, 1.0)
    assert os.path.exists(out[C.RES_PNG_PATH])
    tiles = api.generate_tiles(p, str(tmp_path / "o"), tile_size=64)
    assert tiles["levels"]


@pytest.mark.slow
def test_composite_workflow(star_fits, tmp_path):
    """blend → auto WB → calibrate+SCNR (idempotent) → reset →
    restretch → tone → detect composite → export RGB."""
    p, img = star_fits
    out_dir = str(tmp_path / "o")

    blend = api.blend_channels_cmd(
        [p, p, p],
        [{"channelIdx": 0, "r": 1.0, "g": 0.0, "b": 0.0},
         {"channelIdx": 1, "r": 0.0, "g": 1.0, "b": 0.0},
         {"channelIdx": 2, "r": 0.0, "g": 0.0, "b": 1.0}],
        out_dir, preset="rgb")
    assert os.path.exists(blend[C.RES_PNG_PATH])
    assert GLOBAL_IMAGE_CACHE.contains(C.COMPOSITE_ORIG_R)

    wb = api.compute_auto_wb_cmd()
    assert wb[C.RES_R_FACTOR] == pytest.approx(1.0, abs=0.2)

    cal1 = api.calibrate_and_scnr_cmd(out_dir, 1.5, 1.0, 0.8)
    key_r1 = np.asarray(GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_R).image)
    # idempotence: repeat apply from ORIG gives the same KEY
    cal2 = api.calibrate_and_scnr_cmd(out_dir, 1.5, 1.0, 0.8)
    key_r2 = np.asarray(GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_R).image)
    np.testing.assert_array_equal(key_r1, key_r2)
    orig_r = np.asarray(GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_ORIG_R).image)
    np.testing.assert_allclose(key_r1, orig_r * 1.5, rtol=1e-6)

    reset = api.reset_wb_cmd(out_dir)
    assert reset["reset"] is True
    key_r3 = np.asarray(GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_R).image)
    np.testing.assert_array_equal(key_r3, orig_r)

    restretch = api.restretch_composite_cmd(out_dir, 0.0, 0.4, 1.0,
                                            0.0, 0.4, 1.0, 0.0, 0.4, 1.0)
    assert os.path.exists(restretch[C.RES_PNG_PATH])

    tone = api.apply_tone_composite_cmd(
        out_dir, linked_stf=True,
        curves_r={"points": [[0.0, 0.0], [0.5, 0.6], [1.0, 1.0]]})
    assert tone[C.RES_CURVES_APPLIED]
    assert not tone[C.RES_LEVELS_APPLIED]

    det = api.detect_stars_composite(4.0)
    assert det["star_count"] >= 3

    rgb_tiles = api.generate_tiles_rgb(out_dir, tile_size=64)
    assert rgb_tiles["levels"]

    exp = api.export_fits_rgb(str(tmp_path / "comp.fits"))
    assert exp[C.RES_FILE_SIZE_BYTES] > 0

    exp_png = api.export_rgb_png(str(tmp_path / "comp.png"), bit_depth=8)
    assert os.path.exists(exp_png[C.RES_OUTPUT_PATH])

    api.clear_composite_cache_cmd()
    assert not GLOBAL_IMAGE_CACHE.contains(C.COMPOSITE_KEY_R)


@pytest.mark.slow
def test_wizard_align_crop(star_fits, tmp_path, rng):
    p, img = star_fits
    shifted = np.roll(img, (2, -3), axis=(0, 1))
    p2 = str(tmp_path / "shifted.fits")
    write_fits_mono(p2, shifted)
    out = api.align_channels_cmd([p, p2], str(tmp_path / "o"),
                                 bin_ids=["ha", "oiii"])
    assert len(out[C.RES_CACHE_KEYS]) == 2
    assert GLOBAL_IMAGE_CACHE.contains(C.wizard_aligned_key("oiii"))
    offs = out[C.CHANNELS][1][C.RES_OFFSET]
    assert offs[0] == pytest.approx(2.0, abs=0.5)
    assert offs[1] == pytest.approx(-3.0, abs=0.5)

    crop = api.crop_channels_cmd([p, p2], str(tmp_path / "o"),
                                 bin_ids=["ha", "oiii"])
    assert GLOBAL_IMAGE_CACHE.contains(C.wizard_cropped_key("ha"))
    assert crop[C.RES_OUTPUT_DIMS][0] <= 96


@pytest.mark.slow
def test_processing_commands(star_fits, tmp_path):
    p, _ = star_fits
    out_dir = str(tmp_path / "o")
    rs = api.resample_fits_cmd(p, out_dir, 48, 48)
    assert rs[C.RES_DIMENSIONS] == [48, 48]
    assert "CRPIX1" in rs[C.RES_WCS_UPDATES]
    dec = api.deconvolve_rl_cmd(p, out_dir, iterations=5, psf_sigma=1.5)
    assert dec[C.RES_ITERATIONS_RUN] >= 1
    bg = api.extract_background_cmd(p, out_dir, grid_size=6, poly_degree=2)
    assert bg[C.RES_SAMPLE_COUNT] > 10
    wav = api.wavelet_denoise_cmd(p, out_dir, num_scales=3)
    assert wav[C.RES_SCALES_PROCESSED] == 3
    arc = api.apply_arcsinh_stretch_cmd(p, out_dir, 50.0)
    assert arc[C.RES_STRETCH_FACTOR] == 50.0
    ms = api.masked_stretch_cmd(p, out_dir, iterations=5)
    assert ms[C.RES_ITERATIONS_RUN] >= 1


@pytest.mark.slow
def test_composite_stretch_commands(star_fits, tmp_path):
    p, _ = star_fits
    out_dir = str(tmp_path / "o")
    api.blend_channels_cmd(
        [p, p], [{"channelIdx": 0, "r": 1.0, "g": 0.5, "b": 0.0},
                 {"channelIdx": 1, "r": 0.0, "g": 0.5, "b": 1.0}], out_dir)
    arc = api.arcsinh_stretch_composite_cmd(out_dir, 30.0)
    assert os.path.exists(arc[C.RES_PNG_PATH])
    ms = api.masked_stretch_composite_cmd(out_dir, iterations=3,
                                          shared_mask=True)
    assert ms["mask_mode"] == "shared_luminance"
    api.clear_composite_cache_cmd()


@pytest.mark.slow
def test_stacking_commands(tmp_path, rng):
    frames = []
    base = rng.normal(100.0, 2.0, (48, 48)).astype(np.float32)
    yy, xx = np.mgrid[0:48, 0:48]
    base += 500.0 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 6.0)
    for i in range(4):
        f = base + rng.normal(0, 1.0, (48, 48)).astype(np.float32)
        p = str(tmp_path / f"f{i}.fits")
        write_fits_mono(p, f)
        frames.append(p)
    out = api.stack(frames, str(tmp_path / "o"), align=False,
                    max_iterations=3)
    assert out[C.RES_FRAME_COUNT] == 4
    assert os.path.exists(out[C.RES_FITS_PATH])

    cal = api.calibrate(frames[0], str(tmp_path / "o"),
                        bias_paths=frames[1:3])
    assert cal[C.RES_HAS_BIAS] and not cal[C.RES_HAS_DARK]

    pipe = api.run_pipeline_cmd(
        [{"label": "L", "lights": frames}], str(tmp_path / "o"))
    assert pipe[C.CHANNELS][0][C.RES_LABEL] == "L"
    assert pipe[C.CHANNELS][0]["preview_b64"]


@pytest.mark.slow
def test_cube_commands(tmp_path, rng):
    from tests.test_fits_io import make_fits
    cube = (rng.random((8, 24, 24)) + 0.5).astype(np.float32)
    p = str(tmp_path / "cube.fits")
    with open(p, "wb") as f:
        f.write(make_fits(cube, naxis3=8,
                          extra_cards=[("CRVAL3", "500.0"),
                                       ("CDELT3", "2.0"),
                                       ("CTYPE3", "'WAVE'")]))
    info = api.get_cube_info(p)
    assert info[C.RES_NAXIS3] == 8
    assert info[C.RES_SPECTRAL_CLASSIFICATION]["is_spectral"]
    out = api.process_cube_cmd(p, str(tmp_path / "o"))
    assert out[C.RES_DIMENSIONS] == [24, 24, 8]
    assert os.path.exists(out["collapsed_path"])
    lazy = api.process_cube_lazy_cmd(p, str(tmp_path / "o"))
    assert lazy["total_frames"] == 8
    frame = api.get_cube_frame(p, 3, str(tmp_path / "o"))
    assert os.path.exists(frame[C.RES_PNG_PATH])
    spec = api.get_cube_spectrum(p, 10, 12)
    assert len(spec[C.RES_SPECTRUM]) == 8
    np.testing.assert_allclose(spec[C.RES_SPECTRUM], cube[:, 12, 10],
                               rtol=1e-5)


def test_wcs_and_spcc_commands(star_fits, tmp_path):
    p, _ = star_fits
    wcs = api.get_wcs_info(p)
    assert wcs[C.RES_CENTER_RA] == pytest.approx(150.0, abs=0.1)
    assert wcs[C.RES_WCS_PARAMS][C.RES_WCS_PROJECTION] == "TAN"
    # plate solve must fail cleanly without a key/network
    from astroburst_tpu.errors import SolveError
    with pytest.raises(SolveError):
        api.plate_solve_cmd(p)


@pytest.mark.slow
def test_psf_command(tmp_path, rng):
    from astroburst_tpu.synth import FieldConfig, NoiseParams, SynthConfig, \
        generate
    cfg = SynthConfig(
        field=FieldConfig(width=256, height=256, n_stars=50, seed=3,
                          flux_min=5000, flux_max=20000),
        psf_fwhm=3.5,
        noise=NoiseParams(sky_background=20.0, readout_noise=1.0,
                          exposure_time=10.0, gain=1.0, bias_level=100.0))
    noisy, _, _ = generate(cfg)
    p = str(tmp_path / "psf.fits")
    write_fits_mono(p, np.asarray(noisy))
    out = api.estimate_psf_cmd(p, num_stars=15)
    assert out[C.RES_KERNEL_SIZE] == 31
    assert out[C.RES_AVERAGE_FWHM] == pytest.approx(3.5, abs=1.5)


def test_config_commands():
    cfg = api.get_config()
    assert "astrometry_api_url" in cfg
    updated = api.update_config("plate_solve_max_stars", 150)
    assert updated["plate_solve_max_stars"] == 150
    api.save_api_key("testkey123", "astrometry")
    assert api.get_api_key("astrometry")["api_key"] == "testkey123"


@pytest.mark.slow
def test_synth_commands(tmp_path):
    out = api.generate_synth_cmd(str(tmp_path / "o"), width=128, height=128,
                                 n_stars=20)
    assert os.path.exists(out[C.RES_FITS_PATH])
    assert os.path.exists(out["catalog_path"])
    stack = api.generate_synth_stack_cmd(str(tmp_path / "o"), n_frames=3,
                                         width=96, height=96, n_stars=10)
    assert stack[C.RES_FRAME_COUNT] == 3


def test_output_commands(tmp_path):
    d = str(tmp_path / "o")
    os.makedirs(d)
    with open(os.path.join(d, "junk.png"), "wb") as f:
        f.write(b"x" * 1000)
    info = api.get_output_dir_info(d)
    assert info["file_count"] == 1
    cleaned = api.cleanup_output_cmd(d)
    assert cleaned["cleaned_files"] == 1
