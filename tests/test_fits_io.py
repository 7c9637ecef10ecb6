"""FITS reader/writer tests, byte-level like the reference's
(reference: src-tauri/src/infra/fits/reader.rs:567-643)."""

import io
import os

import numpy as np
import pytest

from astroburst_tpu.io import (extract_image, extract_image_by_index,
                               extract_cube, list_extensions, try_extract_rgb,
                               write_fits_mono, write_fits_rgb)
from astroburst_tpu.io.fits_reader import decode_pixels
from astroburst_tpu.io.fits_writer import filter_header
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.errors import FitsError


def _card(key, value):
    return f"{key:<8}= {value:>20}".ljust(80).encode()


def _header_block(cards):
    blob = b"".join(cards) + b"END".ljust(80)
    pad = (-len(blob)) % 2880
    return blob + b"\0" * pad  # NB: header padding is spaces per spec


def make_fits(data, bitpix=-32, bscale=None, bzero=None, extname=None,
              extra_cards=(), naxis3=None):
    """Hand-rolled FITS bytes (independent of our writer)."""
    h, w = data.shape[-2], data.shape[-1]
    cards = [_card("SIMPLE", "T"), _card("BITPIX", str(bitpix))]
    naxis = 3 if naxis3 else 2
    cards.append(_card("NAXIS", str(naxis)))
    cards.append(_card("NAXIS1", str(w)))
    cards.append(_card("NAXIS2", str(h)))
    if naxis3:
        cards.append(_card("NAXIS3", str(naxis3)))
    if bscale is not None:
        cards.append(_card("BSCALE", repr(bscale)))
    if bzero is not None:
        cards.append(_card("BZERO", repr(bzero)))
    if extname:
        cards.append(_card("EXTNAME", f"'{extname}'"))
    for k, v in extra_cards:
        cards.append(_card(k, v))
    dt = {8: ">u1", 16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8"}[bitpix]
    payload = np.asarray(data).astype(dt).tobytes()
    pad = (-len(payload)) % 2880
    return _header_block(cards) + payload + b"\0" * pad


def test_decode_bitpix_16_bscale_bzero():
    raw = np.array([-3, 0, 7, 32767], dtype=">i2").tobytes()
    out = decode_pixels(raw, 16, bscale=2.0, bzero=100.0)
    np.testing.assert_allclose(out, [94.0, 100.0, 114.0, 65634.0])


def test_decode_bitpix_f32_identity_fast_path():
    vals = np.array([1.5, -2.25, 3e-7, np.nan], dtype=">f4")
    out = decode_pixels(vals.tobytes(), -32, 1.0, 0.0)
    np.testing.assert_array_equal(out[:3], vals.astype(np.float32)[:3])
    assert np.isnan(out[3])


def test_roundtrip_simple(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.5
    p = str(tmp_path / "a.fits")
    with open(p, "wb") as f:
        f.write(make_fits(data))
    img = extract_image(p)
    np.testing.assert_array_equal(img.image, data)
    assert not img.is_mef
    assert img.selected_extension is None


def test_sci_extension_autoselect(tmp_path):
    prim = _header_block([_card("SIMPLE", "T"), _card("BITPIX", "8"),
                          _card("NAXIS", "0"),
                          _card("TELESCOP", "'JWST'")])
    sci_data = np.full((4, 4), 7.0, dtype=np.float32)
    other = make_fits(np.ones((4, 4), dtype=np.float32), extname="ERR")
    sci = make_fits(sci_data, extname="SCI",
                    extra_cards=[("CRVAL1", "10.5")])
    p = str(tmp_path / "mef.fits")
    with open(p, "wb") as f:
        f.write(prim + other + sci)
    img = extract_image(p)
    assert img.is_mef
    assert img.selected_extension == "SCI"
    np.testing.assert_array_equal(img.image, sci_data)
    # merged header: primary TELESCOP + extension CRVAL1
    assert img.header.get("TELESCOP") == "JWST"
    assert img.header.get_f64("CRVAL1") == 10.5
    assert img.extension_count == 3


def test_extension_fallback_first_data_hdu(tmp_path):
    prim = _header_block([_card("SIMPLE", "T"), _card("BITPIX", "8"),
                          _card("NAXIS", "0")])
    d = np.ones((4, 4), dtype=np.float32) * 3
    p = str(tmp_path / "m2.fits")
    with open(p, "wb") as f:
        f.write(prim + make_fits(d, extname="IMG"))
    img = extract_image(p)
    assert img.selected_extension == "IMG"
    np.testing.assert_array_equal(img.image, d)


def test_extract_by_index(tmp_path):
    d0 = np.ones((4, 4), dtype=np.float32)
    d1 = np.full((4, 4), 2.0, dtype=np.float32)
    p = str(tmp_path / "idx.fits")
    with open(p, "wb") as f:
        f.write(make_fits(d0) + make_fits(d1, extname="X"))
    np.testing.assert_array_equal(extract_image_by_index(p, 1).image, d1)
    with pytest.raises(FitsError):
        extract_image_by_index(p, 5)


def test_rgb_fits(tmp_path):
    cube = np.stack([np.full((3, 5), float(i + 1), np.float32)
                     for i in range(3)])
    p = str(tmp_path / "rgb.fits")
    with open(p, "wb") as f:
        f.write(make_fits(cube, naxis3=3))
    rgb = try_extract_rgb(p)
    assert rgb is not None
    np.testing.assert_array_equal(rgb.r, cube[0])
    np.testing.assert_array_equal(rgb.b, cube[2])
    # 2D file is not RGB
    p2 = str(tmp_path / "mono.fits")
    with open(p2, "wb") as f:
        f.write(make_fits(np.zeros((4, 4), np.float32)))
    assert try_extract_rgb(p2) is None


def test_cube_extraction(tmp_path):
    cube = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "cube.fits")
    with open(p, "wb") as f:
        f.write(make_fits(cube, naxis3=2))
    res = extract_cube(p)
    np.testing.assert_array_equal(res.cube, cube)


def test_writer_roundtrip_f32(tmp_path):
    data = np.linspace(-1, 2, 20, dtype=np.float32).reshape(4, 5)
    hdr = HduHeader([("CRVAL1", "1.25"), ("OBJECT", "M16")])
    p = str(tmp_path / "w.fits")
    write_fits_mono(p, data, hdr, bitpix=-32)
    img = extract_image(p)
    np.testing.assert_array_equal(img.image, data)
    assert img.header.get_f64("CRVAL1") == 1.25
    assert img.header.get("OBJECT") == "M16"


def test_writer_bitpix16_autoscale(tmp_path):
    data = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(8, 8)
    p = str(tmp_path / "w16.fits")
    write_fits_mono(p, data, None, bitpix=16)
    img = extract_image(p)
    # 16-bit quantization: max error = bscale/2 = range/65535/2
    np.testing.assert_allclose(img.image, data, atol=1.0 / 65535.0)


def test_writer_rgb_roundtrip(tmp_path):
    r = np.random.default_rng(0).random((4, 4)).astype(np.float32)
    g = r * 0.5
    b = r * 0.25
    p = str(tmp_path / "rgb_w.fits")
    write_fits_rgb(p, r, g, b, None, bitpix=-32)
    rgb = try_extract_rgb(p)
    np.testing.assert_array_equal(rgb.r, r)
    np.testing.assert_array_equal(rgb.g, g)
    np.testing.assert_array_equal(rgb.b, b)


def test_filter_header_wcs_only():
    hdr = HduHeader([("CRVAL1", "1"), ("CRPIX1", "2"), ("OBJECT", "M42"),
                     ("A_0_2", "0.001"), ("EXPTIME", "300")])
    wcs = filter_header(hdr, copy_wcs=True, copy_metadata=False)
    assert [k for k, _ in wcs.cards] == ["CRVAL1", "CRPIX1", "A_0_2"]
    meta = filter_header(hdr, copy_wcs=False, copy_metadata=True)
    assert [k for k, _ in meta.cards] == ["OBJECT", "EXPTIME"]
    assert filter_header(hdr, False, False) is None
    both = filter_header(hdr, True, True)
    assert len(both.cards) == 5


def test_writer_bitpix64_roundtrip(tmp_path):
    data = np.linspace(-5, 5, 12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "w64.fits")
    write_fits_mono(p, data, None, bitpix=-64)
    img = extract_image(p)
    np.testing.assert_array_equal(img.image, data)
    assert list_extensions(p)[0].bitpix == -64
