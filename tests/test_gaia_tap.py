"""Gaia DR3 TAP client unit tests against a canned response.

The reference's default build stubs the client (spcc.rs:273-274); the
`vizier` feature build issues this cone search. No egress here, so the
HTTP layer is monkeypatched.
"""

import io
import urllib.error

import pytest

from astroburst_tpu.astrometry.spcc import (build_gaia_adql,
                                            parse_gaia_tap_csv,
                                            query_gaia_vizier)
from astroburst_tpu.errors import InvalidInput

CANNED_CSV = """ra,dec,bp_rp,phot_g_mean_mag
210.80242917,54.34875000,0.6534,6.52
210.93412500,54.26894444,1.2211,9.14
210.66120833,54.40122222,,10.02
210.71234567,54.31111111,2.0155,11.73
not,a,row,1
"""


def test_adql_contains_cone_and_limits():
    q = build_gaia_adql(210.8, 54.3, 0.75)
    assert "gaiadr3.gaia_source" in q
    assert "CIRCLE('ICRS', 210.80000000, 54.30000000, 0.750000)" in q
    assert q.startswith("SELECT TOP 500 ")
    assert "phot_g_mean_mag < 17.00" in q


def test_parse_canned_csv_skips_bad_rows():
    rows = parse_gaia_tap_csv(CANNED_CSV)
    assert len(rows) == 3  # empty bp_rp row and junk row skipped
    assert rows[0] == {"ra": 210.80242917, "dec": 54.34875,
                       "bp_rp": 0.6534}
    assert rows[2]["bp_rp"] == pytest.approx(2.0155)


def test_parse_reordered_columns():
    text = "bp_rp,dec,ra\n0.5,10.0,20.0\n"
    rows = parse_gaia_tap_csv(text)
    assert rows == [{"ra": 20.0, "dec": 10.0, "bp_rp": 0.5}]


def test_parse_missing_columns_raises():
    with pytest.raises(InvalidInput):
        parse_gaia_tap_csv("foo,bar\n1,2\n")


def test_query_parses_canned_response(monkeypatch):
    captured = {}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["data"] = req.data.decode("ascii")
        return FakeResp(CANNED_CSV.encode())

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    rows = query_gaia_vizier(210.8, 54.3, 1.0)
    assert len(rows) == 3
    assert "gea.esac.esa.int" in captured["url"]
    assert "REQUEST=doQuery" in captured["data"]
    assert "FORMAT=csv" in captured["data"]


def test_query_offline_falls_back(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    with pytest.raises(InvalidInput, match="built-in Bp-Rp"):
        query_gaia_vizier(210.8, 54.3, 1.0)


def test_query_empty_response_falls_back(monkeypatch):
    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr("urllib.request.urlopen",
                        lambda req, timeout=None:
                        FakeResp(b"ra,dec,bp_rp\n"))
    with pytest.raises(InvalidInput, match="no usable rows"):
        query_gaia_vizier(210.8, 54.3, 1.0)
