"""URI.js-compatible URL algebra (pure Python, no dependencies).

The reference crawler (simplecrawler, /root/reference/src/crawler.ts) performs
all URL handling through the public MIT-licensed URI.js library, pinned at
v1.19.1.  Byte-identical canonical URLs are part of this engine's correctness
contract (same URL-seen set, same crawl ordering), so this module re-creates
the *observable behavior* of exactly the URI.js 1.19.1 surface the reference
touches:

    uri(u).absoluteTo(base).normalize().href()      crawler.ts:932, 863-866
    .hostname() .port() .protocol() .path() .resource()   crawler.ts:945-951
    .search("")  (stripQuerystring)                 crawler.ts:913
    .query(sortFn) (sortQueryParameters)            crawler.ts:917-925
    .pathname("/robots.txt")                        crawler.ts:1300

Behaviors verified against the reference's own golden tests
(test/specs/resourcevalidity.integration.spec.ts:117-206,
 test/specs/discovery.unit.spec.ts:22-189).

Implementation notes (semantics transcribed from the documented/public
URI.js 1.19.1 behavior, written Python-first):

- "urn-style" URLs (scheme present, not followed by //) raise on absoluteTo —
  that's how the reference rejects junk like ``mailto:`` or
  ``ur34nfie4985:s////dsf/``.
- normalize(): lowercase scheme+host (IDN hosts punycoded), strip default
  port, resolve dot segments + re-encode path segments, re-serialize the
  query grouping duplicate keys at the first key's position, drop empty
  fragment.
- Query re-serialization dedupes (key, value) pairs with identical values
  but keeps duplicate keys with distinct values.
- encode/decode follow encodeURIComponent/decodeURIComponent with URI.js's
  extra escaping of ``!'()*`` and its path-segment restore map.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

__all__ = ["Uri", "UriError", "parse_query", "build_query"]


class UriError(ValueError):
    """Raised where URI.js would throw (junk URL, urn absoluteTo, bad port)."""


_PROTOCOL_RE = re.compile(r"^[a-z][a-z0-9.+-]*$", re.I)
_INVALID_HOSTNAME_RE = re.compile(r"[^a-zA-Z0-9.\-]")
_PORT_RE = re.compile(r"^[0-9]+$")
_IDN_RE = re.compile(r"[^a-z0-9._\-]", re.I)
_IP4_RE = re.compile(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")

_DEFAULT_PORTS = {
    "http": "80",
    "https": "443",
    "ftp": "21",
    "gopher": "70",
    "ws": "80",
    "wss": "443",
}

# encodeURIComponent keeps A-Za-z0-9 -_.!~*'() ; URI.js strict-encodes
# !'()* on top, so the effective safe set is:
_STRICT_SAFE = "-_.~"

_HEX = "0123456789ABCDEF"


def strict_encode(s: str) -> str:
    """URI.js URI.encode (strictEncodeURIComponent): UTF-8 percent-encoding,
    uppercase hex, keeps only [A-Za-z0-9-_.~]."""
    out = []
    for b in s.encode("utf-8"):
        c = chr(b)
        if c.isascii() and (c.isalnum() or c in _STRICT_SAFE):
            out.append(c)
        else:
            out.append("%" + _HEX[b >> 4] + _HEX[b & 15])
    return "".join(out)


_ESCAPE_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789@*_+-./")


def js_escape(s: str) -> str:
    """JS global escape(): %XX for latin-1, %uXXXX for other UTF-16 units."""
    out = []
    for ch in s:
        cp = ord(ch)
        units = ((0xD800 + ((cp - 0x10000) >> 10), 0xDC00 + ((cp - 0x10000) & 0x3FF))
                 if cp > 0xFFFF else (cp,))
        for u in units:
            c = chr(u)
            if c in _ESCAPE_SAFE:
                out.append(c)
            elif u < 256:
                out.append("%%%02X" % u)
            else:
                out.append("%%u%04X" % u)
    return "".join(out)


# URI.js swaps its encoder to escape() inside .iso8859(); mirror that with a
# module-level dispatch used by the path/query encoders.
_current_encode = strict_encode


def decode_uri_component(s: str) -> str:
    """decodeURIComponent semantics: raises UriError on malformed %-sequences
    or invalid UTF-8 (JS throws URIError)."""
    buf = bytearray()
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "%":
            hx = s[i + 1 : i + 3]
            if len(hx) != 2 or any(c not in "0123456789abcdefABCDEF" for c in hx):
                raise UriError("URI malformed")
            buf.append(int(hx, 16))
            i += 3
        else:
            buf.extend(ch.encode("utf-8"))
            i += 1
    try:
        return buf.decode("utf-8")
    except UnicodeDecodeError as exc:  # JS: URIError
        raise UriError("URI malformed") from exc


# URI.characters.pathname.encode: after strict encoding, restore these
# (they are legal literals inside a path segment).
_PATH_RESTORE = {
    "%24": "$", "%26": "&", "%2B": "+", "%2C": ",",
    "%3B": ";", "%3D": "=", "%3A": ":", "%40": "@",
}
_PATH_RESTORE_RE = re.compile("%(24|26|2B|2C|3B|3D|3A|40)", re.I)
# URI.characters.pathname.decode: after decoding, re-protect these.
_PATH_PROTECT = {"/": "%2F", "?": "%3F", "#": "%23"}


def encode_path_segment(s: str) -> str:
    try:
        enc = _current_encode(s)
    except Exception:
        return s
    return _PATH_RESTORE_RE.sub(lambda m: _PATH_RESTORE[m.group(0).upper()], enc)


def decode_path_segment(s: str) -> str:
    try:
        dec = decode_uri_component(s)
    except UriError:
        return s
    return re.sub(r"[/?#]", lambda m: _PATH_PROTECT[m.group(0)], dec)


def recode_path(path: str) -> str:
    return "/".join(encode_path_segment(decode_path_segment(seg)) for seg in path.split("/"))


def encode_query(s: str, escape_query_space: bool = True) -> str:
    escaped = _current_encode(s)
    return escaped.replace("%20", "+") if escape_query_space else escaped


def decode_query(s: str, escape_query_space: bool = True) -> str:
    s = str(s)
    try:
        return decode_uri_component(s.replace("+", "%20") if escape_query_space else s)
    except UriError:
        return s  # URI.js keeps the raw token on decode failure


_ARRAY_INDEX_RE = re.compile(r"^(0|[1-9][0-9]*)$")


def _js_key_order(keys):
    """JS object key iteration: array-index-like keys first (ascending),
    then string keys in insertion order."""
    idx = [k for k in keys if _ARRAY_INDEX_RE.match(k) and int(k) < 2**32 - 1]
    idx.sort(key=int)
    rest = [k for k in keys if k not in set(idx)]
    return idx + rest


def parse_query(qs: Optional[str], escape_query_space: bool = True) -> dict:
    """URI.parseQuery: dict of key -> str | None | list[str|None]."""
    if not qs:
        return {}
    qs = re.sub(r"&+", "&", qs)
    qs = re.sub(r"^\?*&*|&+$", "", qs)
    if not qs:
        return {}
    items: dict = {}
    for split in qs.split("&"):
        kv = split.split("=")
        name = decode_query(kv[0], escape_query_space)
        value = decode_query("=".join(kv[1:]), escape_query_space) if len(kv) > 1 else None
        if name == "__proto__":
            continue
        if name in items:
            if not isinstance(items[name], list):
                items[name] = [items[name]]
            items[name].append(value)
        else:
            items[name] = value
    return items


def _build_query_param(name: str, value, escape_query_space: bool) -> str:
    enc = encode_query(name, escape_query_space)
    if value is not None:
        enc += "=" + encode_query(str(value), escape_query_space)
    return enc


def build_query(data: dict, duplicate_query_parameters: bool = False,
                escape_query_space: bool = True) -> str:
    parts = []
    for key in _js_key_order(list(data.keys())):
        if key == "" or key is None:
            continue
        val = data[key]
        if isinstance(val, list):
            seen = set()
            for v in val:
                if duplicate_query_parameters:
                    parts.append(_build_query_param(key, v, escape_query_space))
                elif str(v) not in seen:
                    parts.append(_build_query_param(key, v, escape_query_space))
                    seen.add(str(v))
        else:
            parts.append(_build_query_param(key, val, escape_query_space))
    return "&".join(parts)


def _punycode_host(hostname: str) -> str:
    """punycode.toASCII equivalent; raises UriError where punycode chokes."""
    try:
        labels = hostname.split(".")
        out = []
        for lab in labels:
            if lab.isascii():
                out.append(lab)
            else:
                out.append(lab.encode("idna").decode("ascii") if lab else lab)
        return ".".join(out)
    except Exception as exc:
        raise UriError(f"punycode failed for {hostname!r}") from exc


class Uri:
    """Mutable URL object mirroring the URI.js fluent API subset."""

    __slots__ = ("protocol_", "username", "password", "hostname_", "port_",
                 "path_", "query_", "fragment_", "urn")

    def __init__(self, s: Optional[str] = None):
        self.protocol_: Optional[str] = None
        self.username: Optional[str] = None
        self.password: Optional[str] = None
        self.hostname_: Optional[str] = None
        self.port_: Optional[str] = None
        self.path_: str = ""
        self.query_: Optional[str] = None
        self.fragment_: Optional[str] = None
        self.urn: bool = False
        if s is not None:
            self._parse(str(s))

    # ------------------------------------------------------------- parse

    def _parse(self, s: str) -> None:
        pos = s.find("#")
        if pos > -1:
            self.fragment_ = s[pos + 1 :] or None
            s = s[:pos]
        pos = s.find("?")
        if pos > -1:
            self.query_ = s[pos + 1 :] or None
            s = s[:pos]

        if s[:2] == "//":
            self.protocol_ = None
            s = self._parse_authority(s[2:])
        else:
            pos = s.find(":")
            if pos > -1:
                proto = s[:pos] or None
                if proto and not _PROTOCOL_RE.match(proto):
                    pass  # ':' belongs to the path; protocol stays unset
                elif s[pos + 1 : pos + 3].replace("\\", "/") == "//":
                    self.protocol_ = proto
                    s = self._parse_authority(s[pos + 3 :])
                else:
                    self.protocol_ = proto
                    s = s[pos + 1 :]
                    self.urn = True
        self.path_ = s

    def _parse_authority(self, s: str) -> str:
        # userinfo
        shadow = s.replace("\\", "/")
        first_slash = shadow.find("/")
        at = shadow.rfind("@", 0, first_slash if first_slash > -1 else None)
        if at > -1 and (first_slash == -1 or at < first_slash):
            t = s[:at].split(":")
            self.username = decode_uri_component(t[0]) if t[0] else None
            rest = ":".join(t[1:])
            self.password = decode_uri_component(rest) if rest else None
            s = s[at + 1 :]
        # host
        pos = s.find("/")
        if pos == -1:
            pos = len(s)
        if s[:1] == "[":
            bracket = s.find("]")
            self.hostname_ = s[1:bracket] or None
            self.port_ = s[bracket + 2 : pos] or None
            if self.port_ == "/":
                self.port_ = None
        else:
            first_colon = s.find(":")
            next_colon = s.find(":", first_colon + 1)
            fs = s.find("/")
            if next_colon != -1 and (fs == -1 or next_colon < fs):
                # IPv6 without brackets: host, no port
                self.hostname_ = s[:pos] or None
                self.port_ = None
            else:
                t = s[:pos].split(":")
                self.hostname_ = t[0] or None
                self.port_ = (t[1] if len(t) > 1 else None) or None
        if self.hostname_ and s[pos : pos + 1] != "/":
            pos += 1
            s = "/" + s
        if self.hostname_:
            self._ensure_valid_hostname(self.hostname_)
        if self.port_:
            if not _PORT_RE.match(self.port_):
                raise UriError(f'Port "{self.port_}" is not a valid port')
        return s[pos:] or "/"

    @staticmethod
    def _ensure_valid_hostname(v: str) -> None:
        if _INVALID_HOSTNAME_RE.search(v):
            ascii_host = _punycode_host(v)  # raises where punycode chokes
            if _INVALID_HOSTNAME_RE.search(ascii_host):
                raise UriError(
                    f'Hostname "{v}" contains characters other than [A-Z0-9.-]')

    # ------------------------------------------------------------ getters

    def protocol(self) -> str:
        return self.protocol_ or ""

    def hostname(self) -> str:
        return self.hostname_ or ""

    def port(self) -> str:
        return self.port_ or ""

    def path(self) -> str:
        """URI.js pathname() getter."""
        return self.path_ or ("/" if self.hostname_ else "")

    def pathname(self, v: Optional[str] = None):
        if v is None:
            return self.path()
        self.path_ = recode_path(v) if v else "/"
        return self

    def search(self) -> str:
        return ("?" + self.query_) if self.query_ else ""

    def set_search(self, v: str) -> "Uri":
        v = v.lstrip("?")
        self.query_ = v or None
        return self

    def resource(self) -> str:
        frag = ("#" + self.fragment_) if self.fragment_ else ""
        return self.path() + self.search() + frag

    def filename(self) -> str:
        if not self.path_ or self.path_ == "/":
            return ""
        return self.path_[self.path_.rfind("/") + 1 :]

    def directory(self) -> str:
        if not self.path_ and not self.hostname_:
            return ""
        if self.path_ == "/":
            return "/"
        end = len(self.path_) - len(self.filename()) - 1
        return self.path_[: max(end, 0)] or ("/" if self.hostname_ else "")

    def href(self) -> str:
        t = ""
        if self.protocol_:
            t += self.protocol_ + ":"
        require_abs = False
        if not self.urn and (t or self.hostname_):
            t += "//"
            require_abs = True
        t += self._authority()
        if isinstance(self.path_, str):
            if self.path_[:1] != "/" and require_abs:
                t += "/"  # URI.js adds '/' for authority-form URLs, even on empty path
            t += self.path_
        if self.query_:
            t += "?" + self.query_
        if self.fragment_:
            t += "#" + self.fragment_
        return t

    def _authority(self) -> str:
        t = ""
        if self.username:
            t += strict_encode(self.username)
            if self.password:
                t += ":" + strict_encode(self.password)
            t += "@"
        if self.hostname_:
            t += self.hostname_
            if self.port_:
                t += ":" + self.port_
        return t

    def clone(self) -> "Uri":
        c = Uri()
        for slot in self.__slots__:
            setattr(c, slot, getattr(self, slot))
        return c

    # ---------------------------------------------------------- mutators

    def query_fn(self, fn: Callable[[dict], Optional[dict]]) -> "Uri":
        """URI.js .query(function) — parse, let fn rewrite, re-serialize."""
        data = parse_query(self.query_)
        result = fn(data)
        self.query_ = build_query(result if result is not None else data) or None
        return self

    def is_idn(self) -> bool:
        return bool(self.hostname_) and not _IP4_RE.match(self.hostname_) \
            and bool(_IDN_RE.search(self.hostname_))

    def normalize_protocol(self) -> "Uri":
        if self.protocol_:
            self.protocol_ = self.protocol_.lower()
        return self

    def normalize_hostname(self) -> "Uri":
        if self.hostname_:
            if self.is_idn():
                self.hostname_ = _punycode_host(self.hostname_)
            self.hostname_ = self.hostname_.lower()
        return self

    def normalize_port(self) -> "Uri":
        if isinstance(self.protocol_, str) and self.port_ == _DEFAULT_PORTS.get(self.protocol_):
            self.port_ = None
        return self

    def normalize_path(self) -> "Uri":
        path = self.path_
        if not path:
            return self
        if self.urn:
            return self
        if path == "/":
            return self

        path = recode_path(path)

        was_relative = False
        leading_parents = ""
        if path[:1] != "/":
            was_relative = True
            path = "/" + path

        if path[-3:] == "/.." or path[-2:] == "/.":
            path += "/"

        path = re.sub(r"(/(\./)+)|(/\.$)", "/", path)
        path = re.sub(r"/{2,}", "/", path)

        if was_relative:
            m = re.match(r"^(\.\./)+", path[1:])
            leading_parents = m.group(0) if m else ""

        while True:
            m = re.search(r"/\.\.(/|$)", path)
            if not m:
                break
            parent = m.start()
            if parent == 0:
                path = path[3:]
                continue
            pos = path.rfind("/", 0, parent)
            if pos == -1:
                pos = parent
            path = path[:pos] + path[parent + 3 :]

        if was_relative and not self.hostname_:
            path = leading_parents + path[1:]

        self.path_ = path
        return self

    def normalize_query(self) -> "Uri":
        if isinstance(self.query_, str):
            if not self.query_:
                self.query_ = None
            else:
                self.query_fn(lambda data: data)
                if not self.query_:
                    self.query_ = None
        return self

    def normalize_fragment(self) -> "Uri":
        if not self.fragment_:
            self.fragment_ = None
        return self

    def normalize(self) -> "Uri":
        if self.urn:
            return self.normalize_protocol().normalize_path()
        return (self.normalize_protocol()
                .normalize_hostname()
                .normalize_port()
                .normalize_path()
                .normalize_query()
                .normalize_fragment())

    def iso8859(self) -> "Uri":
        """URI.js .iso8859(): re-normalize with escape() as the encoder."""
        global _current_encode
        prev = _current_encode
        _current_encode = js_escape
        try:
            self.normalize()
        finally:
            _current_encode = prev
        return self

    def absolute_to(self, base) -> "Uri":
        if self.urn:
            raise UriError("URNs do not have any generally defined hierarchical components")
        if not isinstance(base, Uri):
            base = Uri(base)
        resolved = self.clone()
        if not resolved.protocol_:
            resolved.protocol_ = base.protocol_
        if self.hostname_:
            return resolved
        for p in ("username", "password", "hostname_", "port_"):
            setattr(resolved, p, getattr(base, p))
        if not resolved.path_:
            resolved.path_ = base.path_
            if not resolved.query_:
                resolved.query_ = base.query_
        else:
            if resolved.path_ == "..":  # JS substring(-2) quirk: whole string == '..'
                resolved.path_ += "/"
            if resolved.path()[:1] != "/":
                basedir = base.directory()
                if not basedir:
                    basedir = "/" if base.path()[:1] == "/" else ""
                resolved.path_ = ((basedir + "/") if basedir else "") + resolved.path_
                resolved.normalize_path()
        return resolved
