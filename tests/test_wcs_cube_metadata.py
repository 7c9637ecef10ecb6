"""WCS transforms, cube processing, filter discovery tests."""

import numpy as np
import pytest

from astroburst_tpu.astrometry.wcs import WcsTransform
from astroburst_tpu.cube import (build_wavelength_axis,
                                 classify_spectral_cube, collapse_mean,
                                 collapse_median, compute_global_stats,
                                 normalize_with_global, LazyCube)
from astroburst_tpu.io.header import HduHeader
from astroburst_tpu.metadata import (Confidence, NarrowbandFilter,
                                     PaletteType, detect_filter,
                                     detect_from_filename,
                                     suggest_palette_with_type)
from astroburst_tpu.metadata.presets import (BLEND_PRESETS,
                                             resolve_preset_weights)

import jax.numpy as jnp


def _wcs_header(**extra):
    cards = [("CRPIX1", "100.0"), ("CRPIX2", "100.0"),
             ("CRVAL1", "150.0"), ("CRVAL2", "30.0"),
             ("CD1_1", "-0.0002777"), ("CD1_2", "0.0"),
             ("CD2_1", "0.0"), ("CD2_2", "0.0002777"),
             ("CTYPE1", "'RA---TAN'"), ("CTYPE2", "'DEC--TAN'")]
    cards += list(extra.items())
    return HduHeader(cards)


def test_wcs_center_maps_to_crval():
    wcs = WcsTransform.from_header(_wcs_header())
    c = wcs.pixel_to_world(99.0, 99.0)  # 0-based CRPIX-1
    assert c.ra == pytest.approx(150.0, abs=1e-9)
    assert c.dec == pytest.approx(30.0, abs=1e-9)


def test_wcs_roundtrip():
    wcs = WcsTransform.from_header(_wcs_header())
    for x, y in [(10.0, 20.0), (150.0, 60.0), (99.0, 99.0)]:
        c = wcs.pixel_to_world(x, y)
        px, py = wcs.world_to_pixel(c.ra, c.dec)
        assert px == pytest.approx(x, abs=1e-6)
        assert py == pytest.approx(y, abs=1e-6)


@pytest.mark.parametrize("proj", ["SIN", "ARC", "CAR"])
def test_wcs_other_projections_roundtrip(proj):
    hdr = _wcs_header()
    hdr.set("CTYPE1", f"'RA---{proj}'")
    wcs = WcsTransform.from_header(hdr)
    c = wcs.pixel_to_world(120.0, 80.0)
    px, py = wcs.world_to_pixel(c.ra, c.dec)
    assert px == pytest.approx(120.0, abs=1e-5)
    assert py == pytest.approx(80.0, abs=1e-5)


def test_wcs_cdelt_crota_fallback():
    hdr = HduHeader([("CRPIX1", "50"), ("CRPIX2", "50"),
                     ("CRVAL1", "10"), ("CRVAL2", "5"),
                     ("CDELT1", "-0.001"), ("CDELT2", "0.001"),
                     ("CROTA2", "0.0")])
    wcs = WcsTransform.from_header(hdr)
    assert wcs.pixel_scale_arcsec() == pytest.approx(3.6, rel=1e-6)
    fw, fh = wcs.field_of_view(100, 100)
    assert fw == pytest.approx(6.0, rel=1e-6)  # arcmin


def test_wcs_dms_format():
    from astroburst_tpu.astrometry.wcs import CelestialCoord
    s = str(CelestialCoord(150.0, -30.5))
    assert s.startswith("10h00m")
    assert "-30°30'" in s


def test_cube_collapse_and_spectrum(rng):
    cube = rng.random((6, 8, 10)).astype(np.float32) + 0.5
    cube[2, 3, 4] = np.nan
    mean = np.asarray(collapse_mean(jnp.asarray(cube)))
    valid = cube[np.isfinite(cube[:, 3, 4]), 3, 4]
    assert mean[3, 4] == pytest.approx(valid.mean(), rel=1e-5)
    med = np.asarray(collapse_median(jnp.asarray(cube)))
    ref = np.sort(valid)[len(valid) // 2]
    assert med[3, 4] == pytest.approx(ref, abs=1e-6)


def test_spectral_classification_chain():
    h1 = HduHeader([("CTYPE3", "'WAVE'")])
    assert classify_spectral_cube(h1, 100).is_spectral
    h2 = HduHeader([("CUNIT3", "'um'"), ("CDELT3", "0.002")])
    assert classify_spectral_cube(h2, 50).is_spectral
    h3 = HduHeader([])
    assert not classify_spectral_cube(h3, 3).is_spectral  # RGB-like
    assert classify_spectral_cube(h3, 100).is_spectral    # high count
    h4 = HduHeader([("CRVAL3", "1.0"), ("CDELT3", "0.01")])
    assert classify_spectral_cube(h4, 8).is_spectral


def test_wavelength_axis():
    h = HduHeader([("CRVAL3", "500.0"), ("CDELT3", "2.0"),
                   ("CRPIX3", "1.0"), ("NAXIS3", "5")])
    axis = build_wavelength_axis(h)
    assert axis == [500.0, 502.0, 504.0, 506.0, 508.0]


def test_cube_global_stats_and_normalize(rng):
    cube = (rng.random((4, 16, 16)) * 2.0 + 1.0).astype(np.float32)
    g = compute_global_stats(jnp.asarray(cube))
    assert 1.0 < g.median < 3.0
    assert g.low < g.median < g.high
    norm = np.asarray(normalize_with_global(jnp.asarray(cube[0]), g))
    assert np.isfinite(norm).all()


def test_lazy_cube_streaming(tmp_path, rng):
    from tests.test_fits_io import make_fits
    cube = (rng.random((10, 12, 14)) + 0.5).astype(np.float32)
    p = str(tmp_path / "cube.fits")
    with open(p, "wb") as f:
        f.write(make_fits(cube, naxis3=10))
    with LazyCube(p) as lc:
        assert lc.geometry.naxis3 == 10
        np.testing.assert_allclose(lc.get_frame(3), cube[3], rtol=1e-6)
        spec = lc.spectrum(5, 6)
        np.testing.assert_allclose(spec, cube[:, 5, 6], rtol=1e-6)
        mean = lc.collapse_mean()
        np.testing.assert_allclose(mean, cube.mean(axis=0), rtol=1e-5)
        med = lc.collapse_median()
        ref = np.sort(cube, axis=0)[5]  # select_nth(10/2) = idx 5
        np.testing.assert_allclose(med, ref, rtol=1e-5)


def test_lazy_cube_bitpix16(tmp_path):
    from tests.test_fits_io import make_fits
    cube = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
    p = str(tmp_path / "c16.fits")
    with open(p, "wb") as f:
        f.write(make_fits(cube, bitpix=16, bscale=0.5, bzero=100.0,
                          naxis3=2))
    with LazyCube(p) as lc:
        np.testing.assert_allclose(lc.get_frame(1),
                                   cube[1] * 0.5 + 100.0, rtol=1e-6)


def test_detect_filter_from_header():
    for value, expected in [("Ha 7nm", NarrowbandFilter.HA),
                            ("OIII 6nm", NarrowbandFilter.OIII),
                            ("SII narrowband", NarrowbandFilter.SII),
                            ("H-alpha", NarrowbandFilter.HA),
                            ("O3", NarrowbandFilter.OIII)]:
        det = detect_filter(HduHeader([("FILTER", value)]))
        assert det is not None and det.filter == expected, value
        assert det.confidence == Confidence.HIGH


def test_detect_filter_from_wavelength():
    det = detect_filter(HduHeader([("WAVELEN", "656.3")]))
    assert det.filter == NarrowbandFilter.HA
    assert det.confidence == Confidence.MEDIUM
    det = detect_filter(HduHeader([("WAVELEN", "5007.0")]))  # Angstrom
    assert det.filter == NarrowbandFilter.OIII


def test_detect_from_filename():
    det = detect_from_filename("NGC7000-OIII-120s.fits")
    assert det.filter == NarrowbandFilter.OIII
    assert det.confidence == Confidence.LOW
    det = detect_from_filename("IC1396_SII_600s.fits")
    assert det.filter == NarrowbandFilter.SII
    assert detect_from_filename("plainimage.fits") is None


def test_suggest_palette_sho():
    files = [
        ("eagle_sii.fits", HduHeader([("FILTER", "SII")])),
        ("eagle_ha.fits", HduHeader([("FILTER", "Ha")])),
        ("eagle_oiii.fits", HduHeader([("FILTER", "OIII")])),
    ]
    s = suggest_palette_with_type(files, PaletteType.SHO)
    assert s.is_complete
    assert s.r_file.file_name == "eagle_sii.fits"
    assert s.g_file.file_name == "eagle_ha.fits"
    assert s.b_file.file_name == "eagle_oiii.fits"


def test_suggest_palette_hoo_duplicates_oiii():
    files = [
        ("m_ha.fits", HduHeader([("FILTER", "Ha")])),
        ("m_oiii.fits", HduHeader([("FILTER", "OIII")])),
    ]
    s = suggest_palette_with_type(files, PaletteType.HOO)
    assert s.is_complete
    assert s.r_file.file_name == "m_ha.fits"
    assert s.g_file.file_name == "m_oiii.fits"
    assert s.b_file.file_name == "m_oiii.fits"


def test_blend_presets_resolve():
    assert set(BLEND_PRESETS) == {"rgb", "sho", "hubble_legacy", "hoo",
                                  "dynamic_hoo", "foraxx"}
    weights = resolve_preset_weights("sho", ["sii", "ha", "oiii"])
    assert weights[0] == {"channel_idx": 0, "r_weight": 1.0, "g_weight": 0.0,
                          "b_weight": 0.0}
    assert len(resolve_preset_weights("hoo", ["ha", "oiii"])) == 2
