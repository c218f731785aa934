"""Minimal stdlib PNG decoder (zlib + struct) — no imaging library needed.

This container has no PIL/imageio, so the multimodal decode step was a
documented stub; plain 8-bit greyscale/RGB/RGBA PNGs, however, are fully
specified by RFC 2083 and decodable with nothing but ``zlib`` (IDAT
inflate) and ``struct`` (chunk headers): parse IHDR, concatenate IDAT,
inflate, undo the five per-scanline filters. That covers synthetic
corpora and most screenshot-style crawl payloads; anything fancier
(16-bit, interlaced, paletted) raises and the caller falls back to the
deterministic fake (operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

__all__ = ["decode_png", "encode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def decode_png(payload: bytes) -> Optional[dict]:
    """Decode an 8-bit non-interlaced grey/RGB/greyA/RGBA PNG.

    Returns None when ``payload`` is not a PNG at all (signature probe —
    the caller's fallback gate); raises on PNGs outside the supported
    subset or on corrupt streams. Result: width, height, channels, mean
    (mean sample value in [0, 1]) and the raw ``pixels`` bytes
    (row-major, channel-interleaved, filters undone).
    """
    if not payload or not payload.startswith(_SIG):
        return None
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # header + data + CRC
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"unsupported PNG subset (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel stream length mismatch")
    out = bytearray()
    prev = bytes(stride)
    p = 0
    for _y in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        out += line
        prev = bytes(line)
    mean = (sum(out) / len(out) / 255.0) if out else 0.0
    return {"width": width, "height": height, "channels": ch,
            "bit_depth": bit_depth, "mean": mean, "pixels": bytes(out)}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels as a filter-0 PNG — the test/synthesis twin
    of decode_png (round-trip asserted in tests/test_multimodal_png.py)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
