"""Link discovery over document text (reference parity kernels).

Parity targets:
- discover_resources       ⇔ Crawler.discoverResources  crawler.ts:965-994
- DISCOVER_EXTRACTORS      ⇔ Crawler.discoverRegex      crawler.ts:516-552
- clean_expand_resources   ⇔ Crawler.cleanExpandResources crawler.ts:846-886

Extractor ORDER is part of the contract (golden ordered lists in
test/specs/discovery.unit.spec.ts). The regexes are transliterated from the
JS patterns with JS's \\s / \\w character classes made explicit.
"""

from __future__ import annotations

import os
import re
from typing import Callable, List, Optional, Union

from .uriref import Uri
from .urlkit import JS_WS, clean_url

__all__ = ["discover_resources", "clean_expand_resources", "DISCOVER_EXTRACTORS"]

_WS = re.escape(JS_WS)
_S = f"[{_WS}]"          # JS \s
_NS = f"[^{_WS}]"        # JS \S

# The 6 regex extractors return every full match (JS String.match with /g/).
_RE_ATTR_QUOTED = re.compile(rf"{_S}(?:href|src){_S}*={_S}*(\"|').*?\1", re.I)
_RE_ATTR_UNQUOTED = re.compile(rf"{_S}(?:href|src){_S}*={_S}*[^\"'{_WS}][^{_WS}>]+", re.I)
_RE_URLFN_QUOTED = re.compile(rf"{_S}?url\(([\"']).*?\1\)", re.I)
_RE_URLFN_UNQUOTED = re.compile(r"[%s]?url\([^\"')]*?\)" % _WS, re.I)
_RE_HTTP_RUN = re.compile(rf"https?://[^?{_WS}><'\",]+", re.I)
_RE_JS_LINK = re.compile(rf"^javascript:{_S}*[A-Za-z0-9_$.]+\(['\"][^'\"{_WS}]+", re.I)

_RE_SRCSET = re.compile(rf"{_S}srcset{_S}*={_S}*(\"|')(.*?)\1")
_RE_META_REFRESH_1 = re.compile(
    rf"<meta[^>]*http-equiv{_S}*={_S}*[\"']?refresh[\"']?[^>]*"
    rf"content{_S}*={_S}*[\"'] ?[^\"'>]*url=([^\"'>]*)[\"']?[^>]*>", re.I)
_RE_META_REFRESH_2 = re.compile(
    rf"<meta[^>]*content{_S}*={_S}*[\"']?[^\"'>]*url=([^\"'>]*)[\"']?[^>]*"
    rf"http-equiv{_S}*={_S}*[\"']?refresh[\"']?[^>]*>", re.I)

_JS_WS_SPLIT = re.compile(_S + "+")


def _regex_all(rx: re.Pattern) -> Callable[[str], List[str]]:
    return lambda text: [m.group(0) for m in rx.finditer(text)]


def _srcset(text: str) -> List[str]:
    m = _RE_SRCSET.search(text)  # first srcset only (non-global exec)
    if not m:
        return []
    return [_JS_WS_SPLIT.split(part.strip(JS_WS))[0] for part in m.group(2).split(",")]


def _meta_refresh(rx: re.Pattern) -> Callable[[str], List[str]]:
    def extract(text: str) -> List[str]:
        m = rx.search(text)
        return [m.group(1)] if m else []
    return extract


# Contract surface: one entry per crawler.ts discoverRegex element, in order.
DISCOVER_EXTRACTORS: List[Callable[[str], List[str]]] = [
    _regex_all(_RE_ATTR_QUOTED),
    _regex_all(_RE_ATTR_UNQUOTED),
    _regex_all(_RE_URLFN_QUOTED),
    _regex_all(_RE_URLFN_UNQUOTED),
    _regex_all(_RE_HTTP_RUN),
    _regex_all(_RE_JS_LINK),
    _srcset,
    _meta_refresh(_RE_META_REFRESH_1),
    _meta_refresh(_RE_META_REFRESH_2),
]

_RE_COMMENTS = re.compile(r"<!--[\s\S]+?-->")
_RE_SCRIPTS = re.compile(r"<script(.*?)>([\s\S]*?)</script>", re.I)
_RE_META_ROBOTS = re.compile(
    rf"<meta(?:{_S}[^>]*)?{_S}name{_S}*={_S}*[\"']?robots[\"']?[^>]*>", re.I)
_RE_META_CONTENT = re.compile(
    rf"<meta(?:{_S}[^>]*)?{_S}content{_S}*={_S}*[\"']?([A-Za-z0-9_{_WS},]+)[\"']?[^>]*>", re.I)
_RE_NOFOLLOW = re.compile(r"nofollow", re.I)


def discover_resources(text: str, *, parse_html_comments: bool = True,
                       parse_script_tags: bool = True,
                       respect_robots_txt: bool = True) -> List[str]:
    """Raw URL-ish matches in document order per extractor (crawler.ts:965-994)."""
    if not parse_html_comments:
        text = _RE_COMMENTS.sub("", text)
    if not parse_script_tags:
        text = _RE_SCRIPTS.sub("", text)

    if respect_robots_txt and _RE_META_ROBOTS.search(text):
        m = _RE_META_CONTENT.search(text.lower())
        if m and _RE_NOFOLLOW.search(m.group(1)):
            return []

    out: List[str] = []
    for extract in DISCOVER_EXTRACTORS:
        out.extend(extract(text))
    return out


# Fast path for discovered URLs that are already canonical absolute http(s)
# references: lowercase reg-name host, no port / userinfo / query / escape /
# IDN, unreserved path charset. Such a URL is a fixed point of
# Uri(url).absolute_to(base).normalize().href() — RFC 3986 §5.2.2 copies a
# scheme'd reference verbatim modulo remove_dot_segments (excluded below),
# and normalize() then has nothing left to change. Equivalence is asserted
# against the forced-slow path in tests/test_urlkit_fastpath.py.
_FAST_ABS_RE = re.compile(
    r"^https?://"
    r"(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)*[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"
    r"(/[A-Za-z0-9/_\-.~]*)$")
_DOTSEG_RE = re.compile(r"/\.{1,2}(?:/|$)")


def clean_expand_resources(url_matches: List[str], page_url: Optional[str],
                           page_protocol: Optional[str],
                           protocol_supported: Callable[[str], bool],
                           disable_fastpath: Optional[bool] = None) -> List[str]:
    """Clean → absolutize → normalize → protocol-filter → ordered set-dedupe
    (crawler.ts:846-886).

    ``disable_fastpath``: force the per-URL Uri round-trip even for
    already-canonical URLs. ``None`` falls back to the
    SPARK_GRAFT_DISABLE_FASTPATH env var — correct for driver-side/unit
    callers, but executor code must pass the flag explicitly (a driver-set
    env var never reaches executors on a real cluster; the wave kernel
    captures it at construction, see operators/udfs.py)."""
    if not url_matches:
        return []
    if disable_fastpath is None:
        disable_fastpath = bool(os.environ.get("SPARK_GRAFT_DISABLE_FASTPATH"))
    fast_ok = not disable_fastpath
    seen = set()
    out: List[str] = []
    for raw in url_matches:
        if not raw:
            continue
        url = clean_url(raw, page_protocol)
        m = _FAST_ABS_RE.match(url) if fast_ok else None
        if m and "//" not in m.group(1) and not _DOTSEG_RE.search(m.group(1)):
            pass  # already canonical: the Uri round-trip is the identity
        else:
            try:
                url = Uri(url).absolute_to(page_url or "").normalize().href()
            except Exception:
                continue
        if not url:
            continue
        if not protocol_supported(url):
            continue
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out
