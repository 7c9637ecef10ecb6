"""Native C++ kernel parity tests (skipped if the toolchain is absent)."""

import numpy as np
import pytest

from astroburst_tpu import native


pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library unavailable")


def test_decode_i16_parity(rng):
    vals = (rng.integers(-30000, 30000, 10000)).astype(">i2")
    got = native.decode_pixels_native(vals.tobytes(), 16, 0.5, 100.0)
    ref = vals.astype(np.float64) * 0.5 + 100.0
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-7)


def test_decode_f32_identity(rng):
    vals = rng.normal(0, 100, 10000).astype(">f4")
    vals[::100] = np.nan
    got = native.decode_pixels_native(vals.tobytes(), -32, 1.0, 0.0)
    ref = vals.astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    np.testing.assert_array_equal(got[~np.isnan(ref)], ref[~np.isnan(ref)])


def test_decode_f64(rng):
    vals = rng.normal(0, 1, 5000).astype(">f8")
    got = native.decode_pixels_native(vals.tobytes(), -64, 2.0, -1.0)
    ref = (vals.astype(np.float64) * 2.0 - 1.0).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_decode_u8_and_i32(rng):
    u8 = rng.integers(0, 255, 1000).astype(">u1")
    got = native.decode_pixels_native(u8.tobytes(), 8, 1.0, 0.0)
    np.testing.assert_array_equal(got, u8.astype(np.float32))
    i32 = rng.integers(-100000, 100000, 1000).astype(">i4")
    got = native.decode_pixels_native(i32.tobytes(), 32, 1.0, 0.0)
    np.testing.assert_array_equal(got, i32.astype(np.float32))


def test_encode_f32_roundtrip(rng):
    data = rng.normal(0, 10, 4096).astype(np.float32)
    blob = native.encode_be_f32_native(data)
    back = np.frombuffer(blob, dtype=">f4").astype(np.float32)
    np.testing.assert_array_equal(back, data)


def test_encode_i16_matches_numpy(rng):
    data = rng.normal(0.5, 0.3, 4096).astype(np.float32)
    bzero, bscale = 0.5, 1.0 / 65535.0
    blob = native.encode_be_i16_native(data, bzero, bscale)
    got = np.frombuffer(blob, dtype=">i2")
    ref = np.clip(np.round((data.astype(np.float64) - bzero) / bscale),
                  -32768, 32767).astype(np.int16)
    # rounding of exact .5 values may differ (round-half-away vs even)
    assert (np.abs(got.astype(np.int32) - ref.astype(np.int32)) <= 1).all()
    assert (got == ref).mean() > 0.999


def test_masked_scan(rng):
    data = rng.random(100000).astype(np.float32)
    data[:1000] = 0.0
    data[1000:1100] = np.nan
    mn, mx, sm, cnt = native.masked_scan_native(data)
    valid = data[np.isfinite(data) & (data > 1e-7)]
    assert cnt == valid.size
    assert mn == pytest.approx(float(valid.min()), rel=1e-7)
    assert mx == pytest.approx(float(valid.max()), rel=1e-7)
    assert sm == pytest.approx(float(valid.astype(np.float64).sum()),
                               rel=1e-9)


def test_reader_uses_native(tmp_path, rng):
    """End-to-end: the FITS reader produces identical planes with and
    without the native decoder."""
    import astroburst_tpu.io.fits_reader as fr
    from astroburst_tpu.io import extract_image, write_fits_mono
    data = rng.normal(100, 10, (64, 64)).astype(np.float32)
    p = str(tmp_path / "n.fits")
    write_fits_mono(p, data, bitpix=16)
    with_native = extract_image(p).image
    import os
    os.environ["ASTROBURST_NO_NATIVE"] = "1"
    native._LIB = None
    native._TRIED = False
    try:
        without = extract_image(p).image
    finally:
        del os.environ["ASTROBURST_NO_NATIVE"]
        native._TRIED = False
    np.testing.assert_allclose(with_native, without, rtol=1e-7)
