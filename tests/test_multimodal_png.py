"""Stdlib PNG decode (functions/png.py) + the multimodal feature probe.

The multimodal decode step was a documented stub (no imaging library in
this container); 8-bit non-interlaced PNGs are now decoded for REAL with
zlib+struct. Known-pixel goldens cover all five scanline filters via a
round-trip (encode filter-0, re-decode) plus hand-built filtered streams.
"""

import struct
import zlib

import pytest

from simplecrawler_spark.functions.png import decode_png, encode_png
from simplecrawler_spark.operators.multimodal import (FEATURE_SCHEMA,
                                                      decode_image,
                                                      extract_features)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png(width, height, color_type, scanlines):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
            + _chunk(b"IEND", b""))


def test_known_rgb_png_header_and_pixels():
    # 2x2 RGB, filter 0: red, green / blue, white
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = _png(2, 2, 2, [b"\x00" + px[:6], b"\x00" + px[6:]])
    d = decode_png(img)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert d["pixels"] == px
    assert d["mean"] == pytest.approx(sum(px) / len(px) / 255.0)


def test_all_filter_types_roundtrip():
    # grayscale 4x5 with a gradient; encode with filter 0, decode, then
    # rebuild the same image using filters 1-4 per line and assert equality
    width, height = 4, 5
    px = bytes(((x * 40 + y * 23) % 256) for y in range(height)
               for x in range(width))
    base = decode_png(encode_png(px, width, height, channels=1))
    assert base["pixels"] == px

    rows = [px[y * width:(y + 1) * width] for y in range(height)]
    lines = []
    prev = bytes(width)
    for y, row in enumerate(rows):
        f = [0, 1, 2, 3, 4][y % 5]
        enc = bytearray()
        for i, v in enumerate(row):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc.append((v - pred) & 0xFF)
        lines.append(bytes([f]) + bytes(enc))
        prev = row
    d = decode_png(_png(width, height, 0, lines))
    assert d["pixels"] == px
    assert d["mean"] == pytest.approx(sum(px) / len(px) / 255.0)


def test_non_png_and_unsupported_subset():
    assert decode_png(b"not a png") is None
    assert decode_png(b"") is None
    # 16-bit depth is outside the stdlib subset
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    img = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(img)


def test_decode_image_probe_and_fallback():
    img = encode_png(bytes([10, 200, 30, 90, 0, 255]), 2, 1, channels=3)
    feats = decode_image(img)          # no fake flag needed: real decode
    assert feats["decoded"] is True
    assert (feats["width"], feats["height"]) == (2, 1)
    assert feats["mean_pixel"] == pytest.approx(585 / 6 / 255.0)
    # non-PNG without the fake flag keeps the honest stub boundary
    with pytest.raises(NotImplementedError):
        decode_image(b"jpeg?")
    fake = decode_image(b"jpeg?", fake="deterministic")
    assert fake["decoded"] is False and fake["width"] is None


def test_image_features_mixed_batch(spark):
    img = encode_png(bytes(range(12)), 2, 2, channels=3)
    df = spark.createDataFrame(
        [(1, bytearray(img)), (2, bytearray(b"plain text payload"))],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in
            df.mapInPandas(extract_features, FEATURE_SCHEMA).collect()}
    assert rows[1]["decoded"] and rows[1]["width"] == 2 \
        and rows[1]["height"] == 2
    assert rows[1]["mean_pixel"] == pytest.approx(sum(range(12)) / 12 / 255.0)
    assert not rows[2]["decoded"] and rows[2]["width"] is None
    assert rows[2]["fake_width"] == (len(b"plain text payload") % 64) + 1
