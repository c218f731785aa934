"""Charset detection + decode, gzip/deflate decompression (parity kernels).

Parity targets:
- decode_buffer ⇔ Crawler.decodeBuffer  crawler.ts:1105-1112
  (charset from Content-Type header, else <meta charset> sniffed in the
   first 512 bytes, else utf8; decoded via an iconv-lite-compatible
   codec-alias resolver)
- unzip         ⇔ zlib.unzip usage      crawler.ts:1790-1802, 1421-1429
  (auto-detects gzip vs zlib wrappers; errors surface so callers can route
   to the gziperror path and fall back to the raw body)

Byte-identical decoded text per URL is part of the engine contract
(golden strings: test/specs/resourcevalidity.integration.spec.ts:269-342).
"""

from __future__ import annotations

import codecs
import re
import zlib
from typing import Optional, Tuple

__all__ = ["decode_buffer", "resolve_encoding", "unzip", "protocol_supported",
           "mime_type_supported"]

_META_CHARSET_RE = re.compile(rb"<meta[^>]*charset\s*=\s*[\"']?([\w-]*)", re.I)

# iconv-lite canonicalization: lowercase, strip all non-alphanumerics and a
# trailing ":NNNN" year suffix.
_CANON_RE = re.compile(r"[^0-9a-z]|:\d{4}$")

# canonical iconv-lite name -> python codec. Covers the single-byte +
# unicode families iconv-lite ships; anything unknown falls back to utf8
# exactly like crawler.ts:1109.
_CODECS = {
    "utf8": "utf-8", "utf16le": "utf-16-le", "utf16be": "utf-16-be",
    "utf16": "utf-16", "ucs2": "utf-16-le", "utf7": "utf-7", "utf32": "utf-32",
    "utf32le": "utf-32-le", "utf32be": "utf-32-be",
    "ascii": "ascii", "usascii": "ascii", "binary": "latin-1", "base64": None,
    "latin1": "latin-1",
}
for i in list(range(1, 17)):
    if i == 12:
        continue
    _CODECS[f"iso8859{i}"] = f"iso8859-{i}"
    _CODECS[f"latin{i}" if i > 1 else "latin1"] = f"iso8859-{i}"
for cp in (1250, 1251, 1252, 1253, 1254, 1255, 1256, 1257, 1258):
    _CODECS[f"windows{cp}"] = f"cp{cp}"
    _CODECS[f"cp{cp}"] = f"cp{cp}"
    _CODECS[f"win{cp}"] = f"cp{cp}"
for cp in (437, 737, 775, 850, 852, 855, 857, 858, 860, 861, 862, 863, 864,
           865, 866, 869, 874, 932, 936, 949, 950):
    _CODECS[f"cp{cp}"] = f"cp{cp}"
_CODECS.update({
    "koi8r": "koi8-r", "koi8u": "koi8-u", "macroman": "mac-roman",
    "maccyrillic": "mac-cyrillic", "shiftjis": "shift-jis", "sjis": "shift-jis",
    "eucjp": "euc-jp", "euckr": "euc-kr", "gbk": "gbk", "gb2312": "gb2312",
    "gb18030": "gb18030", "big5": "big5", "big5hkscs": "big5hkscs",
    "tis620": "cp874", "windows874": "cp874",
    "hex": None,
})


def resolve_encoding(name: str) -> Optional[str]:
    """iconv-lite encodingExists + codec resolution; None when unknown."""
    canon = _CANON_RE.sub("", str(name).lower())
    codec = _CODECS.get(canon)
    if codec is None and canon not in _CODECS:
        return None
    if codec is None:
        return None
    try:
        codecs.lookup(codec)
        return codec
    except LookupError:
        return None


def decode_buffer(buffer: bytes, content_type_header: str = "") -> str:
    """crawler.ts:1105-1112: header charset > inline <meta charset> > utf8."""
    head = buffer[:512]
    m = _META_CHARSET_RE.search(head)
    embedded = m.group(1).decode("latin-1") if m else ""
    header_charset = content_type_header.split("charset=")[1] \
        if "charset=" in content_type_header else ""
    encoding = header_charset or embedded or content_type_header
    codec = resolve_encoding(encoding) or "utf-8"
    return buffer.decode(codec, errors="replace")


def unzip(data: bytes) -> Tuple[Optional[bytes], Optional[str]]:
    """node zlib.unzip: auto-detect gzip/zlib wrapper. (body, error)."""
    try:
        return zlib.decompress(data, zlib.MAX_WBITS | 32), None
    except Exception as exc:
        return None, str(exc)


# --- validity predicates (crawler.ts:466-487,708-741) -----------------------

_ALLOWED_PROTOCOLS = (re.compile(r"^http(s)?$", re.I),
                      re.compile(r"^(rss|atom|feed)(\+xml)?$", re.I))
_SUPPORTED_MIME = (re.compile(r"^text/", re.I),
                   re.compile(r"^application/(rss|html|xhtml)?[+/-]?xml", re.I),
                   re.compile(r"^application/javascript", re.I),
                   re.compile(r"^xml", re.I))


def protocol_supported(url: str, extra: Tuple = ()) -> bool:
    """crawler.ts:708-725 (missing protocol ⇒ 'http')."""
    from .uriref import Uri
    try:
        protocol = Uri(url).protocol() or "http"
    except Exception:
        return False
    checks = _ALLOWED_PROTOCOLS + tuple(extra)
    return any(rx.search(protocol) for rx in checks)


def mime_type_supported(mimetype: str, extra: Tuple = ()) -> bool:
    """crawler.ts:733-741 (string entries compare by equality)."""
    for check in _SUPPORTED_MIME + tuple(extra):
        if isinstance(check, str):
            if check == mimetype:
                return True
        elif check.search(mimetype):
            return True
    return False
