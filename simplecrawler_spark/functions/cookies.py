"""Cookie jar (reference parity kernel).

Parity targets:
- Cookie.from_string ⇔ Cookie.fromString  /root/reference/src/cookies.ts:212-249
- CookieJar.add      ⇔ CookieJar.add      /root/reference/src/cookies.ts:32-58
  (upsert keyed on (name, matchDomain); empty name throws — the crawler
   routes that to the ``cookieerror`` event, crawler.ts:1807-1813)
- get_as_header      ⇔ getAsHeader        /root/reference/src/cookies.ts:128-149
- match_domain/path  ⇔ cookies.ts:308-330 (reversed-string suffix match)

In the Spark engine the jar is a small per-wave side table (MERGE keyed on
(name, domain)); these kernels run inside Arrow batches when parsing
``Set-Cookie`` headers gathered from a wave's responses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import List, Optional

__all__ = ["Cookie", "CookieJar", "parse_expires_ms"]

_SETCOOKIE_PREFIX = re.compile(r"^\s*set-cookie\s*:\s*", re.I)
_ATTR_KEY_CLEAN = re.compile(r"[^a-z0-9]", re.I)
_WS_ONLY = re.compile(r"\s+")


def parse_expires_ms(expires) -> int:
    """JS ``new Date(str).getTime()`` for cookie Expires values → epoch ms.

    Falsy ⇒ -1 (session cookie, cookies.ts:195-201). Unparseable ⇒ -2
    (stand-in for NaN: such a cookie compares expired like in JS where
    NaN < Date.now() is false — NaN comparisons are false, so NaN expiry
    never expires; we use -1 semantics for that case too).
    """
    if expires is None or expires == "" or expires == 0:
        return -1
    if isinstance(expires, (int, float)):
        return int(expires)
    s = str(expires).strip()
    try:
        dt = parsedate_to_datetime(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    except Exception:
        pass
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(s, fmt)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)
        except ValueError:
            continue
    return -1  # NaN-equivalent: never expires


def _parse_keyval(part: str):
    bits = part.split("=")
    return bits[0], "=".join(bits[1:])


@dataclass
class Cookie:
    name: str
    value: str = ""
    expires: int = -1  # epoch ms; -1 = session/never
    path: str = "/"
    domain: str = "*"
    httponly: bool = False

    def __post_init__(self):
        if not self.name:
            raise ValueError("A name is required to create a cookie.")

    @staticmethod
    def from_string(s: str) -> "Cookie":
        """Parse one Set-Cookie header (cookies.ts:212-249)."""
        if not s or not isinstance(s, str):
            raise ValueError("String must be supplied to generate a cookie.")
        s = _SETCOOKIE_PREFIX.sub("", s, count=1)
        parts = re.split(r"\s*;\s*", s)
        name, value = _parse_keyval(parts.pop(0) if parts else "")
        attrs = {}
        for part in parts:
            if not _WS_ONLY.sub("", part):
                continue
            k, v = _parse_keyval(part)
            attrs[_ATTR_KEY_CLEAN.sub("", str(k).lower())] = v or ""
        return Cookie(
            name=name or "",
            value=value or "",
            expires=parse_expires_ms(attrs.get("expires") or attrs.get("expiry")),
            path=attrs.get("path", "/") or "",
            domain=attrs.get("domain", "*") or "",
            httponly="httponly" in attrs,
        )

    def to_outbound_string(self) -> str:
        return f"{self.name}={self.value}"

    def is_expired(self, now_ms: int) -> bool:
        if self.expires < 0:
            return False
        return self.expires < now_ms

    def match_domain(self, domain: str) -> bool:
        """Reversed-string suffix match (cookies.ts:308-317)."""
        if self.domain == "*":
            return True
        return self.domain[::-1].startswith(domain[::-1])

    def match_path(self, path: str) -> bool:
        if not self.path:
            return True
        return path.startswith(self.path)


class CookieJar:
    """List-backed jar; in the engine this becomes the ``cookies`` side table
    with MERGE-on-(name, domain) per wave."""

    def __init__(self) -> None:
        self.cookies: List[Cookie] = []

    def add(self, cookie_or_header, *args) -> Cookie:
        if isinstance(cookie_or_header, Cookie):
            new = cookie_or_header
        elif args:
            new = Cookie(str(cookie_or_header), *args)
        else:
            new = Cookie.from_string(cookie_or_header)
        for i, c in enumerate(self.cookies):
            if c.name == new.name and c.match_domain(new.domain):
                self.cookies[i] = new
                return new
        self.cookies.append(new)
        return new

    def add_from_headers(self, headers) -> List[str]:
        """Add each Set-Cookie header; returns error strings for faulty ones
        (the crawler's cookieerror path, crawler.ts:1807-1813)."""
        if isinstance(headers, str):
            headers = [headers]
        errors = []
        for h in headers:
            try:
                self.add(h)
            except ValueError as exc:
                errors.append(str(exc))
        return errors

    def remove(self, name: Optional[str] = None, domain: Optional[str] = None) -> List[Cookie]:
        """Replicates the reference's splice-while-iterating observable
        behavior for single-match removals (cookies.ts:68-93)."""
        removed = []
        i = 0
        for c in list(self.cookies):
            if name and c.name != name:
                i += 1
                continue
            if domain and not c.match_domain(domain):
                i += 1
                continue
            removed.append(self.cookies.pop(i))
        return removed

    def get(self, name: Optional[str] = None, domain: Optional[str] = None) -> List[Cookie]:
        out = []
        for c in self.cookies:
            if name and c.name != name:
                continue
            if domain and not c.match_domain(domain):
                continue
            out.append(c)
        return out

    def get_as_header(self, domain: Optional[str] = None, path: Optional[str] = None,
                      now_ms: int = 0) -> List[str]:
        """cookies.ts:128-149 — note domain filter short-circuits path."""
        out = []
        for c in self.cookies:
            if c.is_expired(now_ms):
                continue
            if not domain and not path:
                out.append(c.to_outbound_string())
            elif domain:
                if c.match_domain(domain):
                    out.append(c.to_outbound_string())
            elif path:
                if c.match_path(path):
                    out.append(c.to_outbound_string())
        return out
