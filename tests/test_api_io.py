"""End-to-end ingestion command tests (cmd/io/mod.rs parity)."""

import os

import numpy as np
import pytest

from astroburst_tpu import constants as C
from astroburst_tpu.api.io import (get_raw_pixels_preview, process_fits,
                                   process_fits_full)
from astroburst_tpu.io import write_fits_mono, write_fits_rgb
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.ops.ipc import decode_binary_pixels
from tests.conftest import ref_stats


@pytest.fixture
def mono_fits(tmp_path, rng):
    data = (rng.random((64, 96)).astype(np.float32) * 0.8 + 0.01)
    p = str(tmp_path / "mono.fits")
    write_fits_mono(p, data, HduHeader([("OBJECT", "M31"), ("EXPTIME", "60")]))
    return p, data


def test_process_fits(mono_fits, tmp_path):
    p, data = mono_fits
    out = process_fits(p, str(tmp_path / "out"))
    assert out[C.RES_DIMENSIONS] == [96, 64]
    assert os.path.exists(out[C.RES_PNG_PATH])
    ref = ref_stats(data)
    assert out[C.RES_STATS][C.RES_MEDIAN] == pytest.approx(ref["median"], abs=1e-5)
    assert out[C.RES_STATS][C.RES_MIN] == pytest.approx(ref["min"], abs=1e-7)
    stf = out[C.RES_STF]
    assert 0 < stf[C.RES_MIDTONE] < 1
    assert C.RES_ELAPSED_MS in out


@pytest.mark.slow
def test_process_fits_full(mono_fits, tmp_path):
    p, data = mono_fits
    out = process_fits_full(p, str(tmp_path / "out"))
    assert out[C.RES_HEADER]["OBJECT"] == "M31"
    hist = out[C.RES_HISTOGRAM]
    assert hist[C.RES_BIN_COUNT] == C.HISTOGRAM_BINS_DISPLAY
    assert sum(hist[C.RES_BINS]) == out[C.RES_HISTOGRAM][C.RES_TOTAL_PIXELS]
    assert C.RES_MAD in out[C.RES_STATS]


@pytest.mark.slow
def test_process_rgb_fits_seeds_composite(tmp_path, rng):
    r = rng.random((32, 32)).astype(np.float32) + 0.1
    g = r * 0.5
    b = r * 0.25
    p = str(tmp_path / "rgb.fits")
    write_fits_rgb(p, r, g, b)
    out = process_fits_full(p, str(tmp_path / "out"))
    assert out["is_rgb"] is True
    assert C.STF_R in out and C.STF_B in out
    from astroburst_tpu.runtime.cache import GLOBAL_IMAGE_CACHE
    for key in (C.COMPOSITE_ORIG_R, C.COMPOSITE_KEY_R, C.COMPOSITE_KEY_B):
        assert GLOBAL_IMAGE_CACHE.contains(key)
    np.testing.assert_array_equal(
        np.asarray(GLOBAL_IMAGE_CACHE.get(C.COMPOSITE_KEY_G).image), g)


def test_get_raw_pixels_preview(mono_fits):
    p, data = mono_fits
    blob = get_raw_pixels_preview(p)
    arr, mn, mx = decode_binary_pixels(blob)
    assert arr.shape == data.shape  # under the 2048 cap → full res
    np.testing.assert_allclose(arr, data, rtol=1e-6)
    assert mn == pytest.approx(float(data.min()), rel=1e-6)
    assert mx == pytest.approx(float(data.max()), rel=1e-6)


def test_raw_preview_downsamples(tmp_path, rng):
    data = rng.random((300, 500)).astype(np.float32)
    p = str(tmp_path / "big.fits")
    write_fits_mono(p, data)
    blob = get_raw_pixels_preview(p, max_dim=100)
    arr, _, _ = decode_binary_pixels(blob)
    assert max(arr.shape) <= 100


def test_raw_preview_scrubs_nans(tmp_path):
    data = np.ones((16, 16), dtype=np.float32)
    data[0, 0] = np.nan
    p = str(tmp_path / "nan.fits")
    write_fits_mono(p, data)
    arr, _, _ = decode_binary_pixels(get_raw_pixels_preview(p))
    assert arr[0, 0] == 0.0
    assert np.isfinite(arr).all()


@pytest.mark.slow
def test_zip_transparency(tmp_path, rng):
    import zipfile
    data = rng.random((16, 16)).astype(np.float32) + 0.2
    inner = str(tmp_path / "inner.fits")
    write_fits_mono(inner, data)
    zpath = str(tmp_path / "bundle.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "inner.fits")
    out = process_fits(zpath, str(tmp_path / "out"))
    assert out[C.RES_DIMENSIONS] == [16, 16]


def test_export_zip_bundle(tmp_path):
    import zipfile
    import astroburst_tpu.api as api
    p1 = tmp_path / "m16_ha.png"
    p1.write_bytes(b"\x89PNG fake")
    p2 = tmp_path / "m16_oiii.fits"
    p2.write_bytes(b"SIMPLE")
    pcts = []
    out = api.export_zip_bundle(
        [str(p1), str(p2), str(tmp_path / "missing.png")],
        str(tmp_path / "bundle.zip"), progress_cb=pcts.append)
    assert out["files"] == ["m16_ha.png", "m16_oiii.png"]
    assert out["skipped"] == [str(tmp_path / "missing.png")]
    assert pcts[-1] == 100 and pcts[0] <= 90
    with zipfile.ZipFile(tmp_path / "bundle.zip") as zf:
        assert sorted(zf.namelist()) == ["m16_ha.png", "m16_oiii.png"]
        assert all(i.compress_type == zipfile.ZIP_STORED
                   for i in zf.infolist())
    assert "elapsed_ms" in out


def test_nearest_downsample_take_form_matches_stride(rng):
    """take-based NN downsample selects exactly the strided grid."""
    import jax.numpy as jnp
    from astroburst_tpu.ops.ipc import nearest_downsample
    x = jnp.asarray(rng.random((300, 201)).astype("float32"))
    small = np.asarray(nearest_downsample(x, 100))
    stride = 3
    np.testing.assert_array_equal(small, np.asarray(x)[::stride, ::stride])
    assert small.shape[0] <= 100 and small.shape[1] <= 100
    # no-op below the cap
    assert nearest_downsample(x, 512) is x


def test_save_stf_preview_png_downsample_first(tmp_path, rng):
    """Downsample-first STF preview equals quantize-then-subsample
    (pointwise STF commutes with NN subsampling)."""
    import jax.numpy as jnp
    from astroburst_tpu.api import helpers
    from astroburst_tpu.ops.stats import compute_image_stats
    from astroburst_tpu.imaging.stf import apply_stf_u8, auto_stf
    from astroburst_tpu.ops.ipc import nearest_downsample

    img = (rng.random((257, 130)) * 900.0).astype("float32")
    stats = compute_image_stats(img)
    stf = auto_stf(stats)
    p = str(tmp_path / "prev.png")
    helpers.save_stf_preview_png(jnp.asarray(img), stf, stats, p, max_dim=64)
    assert (tmp_path / "prev.png").exists()
    want = np.asarray(apply_stf_u8(
        nearest_downsample(jnp.asarray(img), 64), stf, stats))
    import cv2
    got = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(got, want)
