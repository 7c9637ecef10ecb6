"""ASDF reader tests on hand-built ASDF byte streams."""

import struct
import zlib

import numpy as np
import pytest

from astroburst_tpu.errors import AsdfError
from astroburst_tpu.io.asdf import (extract_image_from_asdf, load_asdf_image,
                                    open_asdf)

BLOCK_MAGIC = b"\xd3BLK"


def make_block(data: bytes, compression: bytes = b"\0\0\0\0") -> bytes:
    if compression.rstrip(b"\0") == b"zlib":
        payload = zlib.compress(data)
    else:
        payload = data
    header = (struct.pack(">I", 0) + compression +
              struct.pack(">Q", len(payload)) +   # allocated
              struct.pack(">Q", len(payload)) +   # used
              struct.pack(">Q", len(data)) +      # data size
              b"\0" * 16)
    return BLOCK_MAGIC + struct.pack(">H", len(header)) + header + payload


def make_asdf(tree_yaml: str, blocks) -> bytes:
    sep = b" " if tree_yaml.startswith("!") else b"\n"
    head = (b"#ASDF 1.0.0\n#ASDF_STANDARD 1.5.0\n"
            b"%YAML 1.1\n---" + sep + tree_yaml.encode() + b"\n...\n")
    return head + b"".join(blocks)


def test_basic_asdf_roundtrip(tmp_path):
    data = np.arange(12, dtype=">f4").reshape(3, 4)
    tree = ("!core/asdf-1.1.0\n"
            "data: !core/ndarray-1.0.0\n"
            "  source: 0\n"
            "  datatype: float32\n"
            "  byteorder: big\n"
            "  shape: [3, 4]\n"
            "meta:\n"
            "  instrument:\n"
            "    name: NIRCAM\n")
    p = str(tmp_path / "a.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes())]))
    img = load_asdf_image(p)
    assert (img.height, img.width) == (3, 4)
    np.testing.assert_array_equal(img.data, data.astype(np.float32))
    assert img.metadata["meta.instrument.name"] == "NIRCAM"
    assert img.header.get("ASDF_SRC") == "true"
    assert img.header.get("META_INSTRUMENT_NAME") == "NIRCAM"


def test_zlib_compressed_block(tmp_path):
    data = np.ones((8, 8), dtype="<f4") * 2.5
    tree = ("data:\n  source: 0\n  datatype: float32\n"
            "  byteorder: little\n  shape: [8, 8]\n")
    p = str(tmp_path / "z.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes(), b"zlib")]))
    img = load_asdf_image(p)
    np.testing.assert_allclose(img.data, 2.5)


def test_roman_datamodel_path(tmp_path):
    data = np.arange(6, dtype=">u2").reshape(2, 3)
    tree = ("roman:\n"
            "  data:\n    source: 0\n    datatype: uint16\n"
            "    byteorder: big\n    shape: [2, 3]\n"
            "  meta:\n    telescope: ROMAN\n")
    p = str(tmp_path / "r.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes())]))
    img = load_asdf_image(p)
    np.testing.assert_array_equal(img.data, data.astype(np.float32))
    assert img.metadata["ASDF_DATA_KEY"] == "roman.data"
    assert img.metadata["roman.meta.telescope"] == "ROMAN"


def test_deep_search_fallback(tmp_path):
    data = np.zeros((2, 2), dtype=">f4")
    tree = ("products:\n"
            "  lvl2:\n"
            "    arr:\n      source: 0\n      datatype: float32\n"
            "      byteorder: big\n      shape: [2, 2]\n")
    p = str(tmp_path / "d.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes())]))
    img = load_asdf_image(p)
    assert (img.height, img.width) == (2, 2)


def test_wcs_extraction(tmp_path):
    data = np.zeros((4, 4), dtype=">f4")
    tree = ("data:\n  source: 0\n  datatype: float32\n"
            "  byteorder: big\n  shape: [4, 4]\n"
            "wcs:\n"
            "  crpix: [2.0, 2.0]\n  crval: [150.0, 30.0]\n"
            "  cdelt: [0.001, 0.001]\n")
    p = str(tmp_path / "w.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes())]))
    img = load_asdf_image(p)
    assert img.wcs is not None
    assert img.wcs.crval == (150.0, 30.0)
    assert img.header.get_f64("CRVAL1") == 150.0


def test_multichannel_shape(tmp_path):
    data = np.arange(3 * 2 * 2, dtype=">f4").reshape(3, 2, 2)
    tree = ("data:\n  source: 0\n  datatype: float32\n"
            "  byteorder: big\n  shape: [3, 2, 2]\n")
    p = str(tmp_path / "c.asdf")
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [make_block(data.tobytes())]))
    img = load_asdf_image(p)
    assert img.channels == 3
    np.testing.assert_array_equal(img.data, data[0].astype(np.float32))


def test_companion_fits_fallback(tmp_path, rng):
    from astroburst_tpu.io import write_fits_mono
    d = rng.random((6, 6)).astype(np.float32)
    write_fits_mono(str(tmp_path / "x.fits"), d)
    with open(str(tmp_path / "x.asdf"), "wb") as f:
        f.write(b"#ASDF 1.0.0\nnot actually valid yaml blocks")
    img = extract_image_from_asdf(str(tmp_path / "x.asdf"))
    np.testing.assert_array_equal(img.data, d)


def test_invalid_magic(tmp_path):
    p = str(tmp_path / "bad.asdf")
    with open(p, "wb") as f:
        f.write(b"NOTASDF")
    with pytest.raises(AsdfError):
        open_asdf(p)


# ---- vendored LZ4 block decoder (blocks.rs:135-139 lz4_flex parity) ----

def lz4_literals(data: bytes) -> bytes:
    """Minimal valid LZ4 block: one all-literal sequence."""
    out = bytearray()
    lit = len(data)
    tok = min(lit, 15)
    out.append(tok << 4)
    if tok == 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data
    return bytes(out)


def test_lz4_literal_roundtrip():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    data = bytes(range(256)) * 3
    assert lz4_block_decompress(lz4_literals(data), len(data)) == data


def test_lz4_match_copy():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    # "abcd" literal then match offset=4 len=8 -> "abcdabcdabcd"
    src = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00])
    assert lz4_block_decompress(src, 12) == b"abcdabcdabcd"


def test_lz4_overlapping_match_rle():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    # "a" literal then match offset=1 len=7 -> "aaaaaaaa"
    src = bytes([0x13]) + b"a" + bytes([0x01, 0x00])
    assert lz4_block_decompress(src, 8) == b"a" * 8


def test_lz4_extended_lengths():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    data = b"x" * 300
    out = lz4_block_decompress(lz4_literals(data), 300)
    assert out == data
    # extended match length: 2 literals, match offset=2 len=19+4+255+3
    src = (bytes([0x2F]) + b"ab" + bytes([0x02, 0x00]) +
           bytes([255, 3]))
    want = b"ab" + (b"ab" * 200)[:15 + 4 + 255 + 3]
    assert lz4_block_decompress(src, len(want)) == want


def test_lz4_invalid_offset_raises():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    from astroburst_tpu.errors import AsdfError
    src = bytes([0x14]) + b"a" + bytes([0x09, 0x00])  # offset 9 > produced
    with pytest.raises(AsdfError):
        lz4_block_decompress(src, 6)


def test_lz4_size_mismatch_raises():
    from astroburst_tpu.io.asdf import lz4_block_decompress
    from astroburst_tpu.errors import AsdfError
    with pytest.raises(AsdfError):
        lz4_block_decompress(lz4_literals(b"abc"), 99)


def test_lz4_compressed_block_end_to_end(tmp_path):
    """lz4 ASDF block decodes through open_asdf (blocks.rs asdf-full
    feature parity, no third-party lz4 needed)."""
    from astroburst_tpu.io.asdf import open_asdf
    data = np.arange(64, dtype="<f4")
    payload = lz4_literals(data.tobytes())
    header = (struct.pack(">I", 0) + b"lz4\0" +
              struct.pack(">Q", len(payload)) +
              struct.pack(">Q", len(payload)) +
              struct.pack(">Q", data.nbytes) +
              b"\0" * 16)
    block = BLOCK_MAGIC + struct.pack(">H", len(header)) + header + payload
    tree = ("data: !core/ndarray-1.0.0 {source: 0, datatype: float32, "
            "byteorder: little, shape: [64]}")
    p = tmp_path / "lz4.asdf"
    with open(p, "wb") as f:
        f.write(make_asdf(tree, [block]))
    af = open_asdf(str(p))
    got = np.frombuffer(af.blocks[0], dtype="<f4")
    np.testing.assert_array_equal(got, data)
