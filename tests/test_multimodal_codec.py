"""operators/multimodal.py BMP codec: the decoder must be a real BMP
parser — header-driven, padding-aware, orientation-tolerant — not an
inverse of our encoder's happy path."""

from __future__ import annotations

import struct

import pytest

from beam_scala_examples_spark.operators.multimodal import (
    _bmp_pixels,
    decode_bmp,
    encode_bmp,
)


def test_round_trip_matches_pixel_formula():
    text = "The quick brown fox jumps over the lazy dog"
    doc_id = 7
    w, h = 1 + len(text) % 7, 1 + doc_id % 5
    px = _bmp_pixels(text, w * h)
    got = decode_bmp(encode_bmp(doc_id, text))
    assert got == {
        "width": w,
        "height": h,
        "sum_r": sum(p[0] for p in px),
        "sum_g": sum(p[1] for p in px),
        "sum_b": sum(p[2] for p in px),
    }


def test_row_padding_not_counted():
    # width 2 -> 6 pixel bytes/row + 2 padding bytes; a decoder that
    # walks rows as 3*w without honouring the 4-byte stride would read
    # padding as pixels from row 2 on.
    text = "a"          # w = 1 + 1 % 7 = 2
    got = decode_bmp(encode_bmp(4, text))  # h = 1 + 4 % 5 = 5
    assert (got["width"], got["height"]) == (2, 5)
    v = ord("a")
    n_px = 2 * 5
    assert got["sum_r"] == got["sum_g"] == got["sum_b"] == v * n_px


def test_top_down_bmp_decodes():
    """Negative biHeight (top-down raster) is legal BMP; the decoder
    must take abs() for geometry.  Build one by hand."""
    w, h = 3, 2
    row = (3 * w + 3) // 4 * 4
    raster = bytearray()
    for y in range(h):           # top-down: row 0 first
        for x in range(w):
            raster += bytes((10, 20, 30))  # B, G, R
        raster += b"\x00" * (row - 3 * w)
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(raster),
                      0, 0, 0, 0)
        + bytes(raster)
    )
    got = decode_bmp(payload)
    assert got == {
        "width": w, "height": h,
        "sum_r": 30 * w * h, "sum_g": 20 * w * h, "sum_b": 10 * w * h,
    }


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00garbage")
    good = bytearray(encode_bmp(1, "xyz"))
    good[28] = 8  # biBitCount = 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(good))
