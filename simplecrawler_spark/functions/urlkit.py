"""URL cleaning + queue-item construction (reference parity kernels).

Parity targets:
- clean_url   ⇔ cleanURL            /root/reference/src/crawler.ts:36-54
- process_url ⇔ Crawler.processURL  /root/reference/src/crawler.ts:895-958

These are pure functions over Python strings; the Spark layer wraps them in
Arrow-batched pandas UDFs (one Python call per record batch, no per-row
Python at the DataFrame API level).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from .uriref import Uri, UriError, build_query, parse_query

__all__ = ["UrlOptions", "clean_url", "process_url", "js_trim", "sort_query_keys"]

# JS \\s character class (ECMAScript WhiteSpace + LineTerminator).
JS_WS = ("\t\n\x0b\x0c\r \xa0\u1680"
         "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
         "\u2028\u2029\u202f\u205f\u3000\ufeff")
_WS = re.escape(JS_WS)

_RE_ATTR_FLUFF = re.compile(rf"^(?:[{_WS}]*href|[{_WS}]*src)[{_WS}]*=+[{_WS}]*", re.I)
_RE_LEAD_WS = re.compile(rf"^[{_WS}]*")
_RE_QUOTED = re.compile(r"^(['\"])(.*)\1$")
_RE_URL_FN = re.compile(r"^url\((.*)\)", re.I)
_RE_JAVASCRIPT = re.compile(
    rf"^javascript:[{_WS}]*([A-Za-z0-9_]*\(['\"](.*)['\"]\))*.*", re.I)
_RE_PARENS = re.compile(r"^\((.*)\)$")


def js_trim(s: str) -> str:
    """String.prototype.trim (JS whitespace set)."""
    return s.strip(JS_WS)


def clean_url(url: str, page_protocol: Optional[str]) -> str:
    """Strip HTML-attribute fluff, quotes, url(...), javascript:, entities,
    protocol-relative '//', and the fragment. Returns '' for empty results.

    ``page_protocol`` is the protocol of the page the URL was found on; the
    reference substitutes the literal string ``undefined`` when the queue
    item has no protocol (observable in discovery.unit.spec.ts:22-30).
    """
    s = _RE_ATTR_FLUFF.sub("", url, count=1)
    s = _RE_LEAD_WS.sub("", s, count=1)
    s = _RE_QUOTED.sub(lambda m: m.group(2), s, count=1)
    s = _RE_URL_FN.sub(lambda m: m.group(1), s, count=1)
    s = _RE_JAVASCRIPT.sub(lambda m: m.group(2) or "", s, count=1)
    s = _RE_QUOTED.sub(lambda m: m.group(2), s, count=1)
    s = _RE_PARENS.sub(lambda m: m.group(1), s, count=1)
    if s[:2] == "//":
        proto = page_protocol if page_protocol is not None else "undefined"
        s = proto + "://" + s[2:]
    s = re.sub("&amp;", "&", s, flags=re.I)
    s = re.sub("&#38;", "&", s, flags=re.I)
    s = re.sub("&#x00026;", "&", s, flags=re.I)
    s = re.sub("&#x2f;", "/", s, flags=re.I)
    s = s.split("#")[0]
    return js_trim(s) if s else ""


@dataclass
class UrlOptions:
    """The subset of crawler config that affects URL canonicalization
    (crawler.ts:498-510,383)."""
    strip_querystring: bool = False
    sort_query_parameters: bool = False
    strip_www_domain: bool = False
    url_encoding: str = "unicode"  # or "iso8859"


_DEFAULT_OPTS = UrlOptions()
_RE_WWW = re.compile(r"https?://(www\.)", re.I)


def sort_query_keys(data: dict) -> dict:
    """processURL's sortQueryParameters callback: keys sorted, duplicate-key
    value order preserved (crawler.ts:917-925)."""
    return {k: data[k] for k in sorted(data.keys())}


def process_url(url: str, referrer_url: Optional[str], referrer_depth: Optional[int],
                opts: UrlOptions = _DEFAULT_OPTS, initial_url: str = "") -> Optional[dict]:
    """Construct a queue-item dict from a raw URL + referrer, or None for junk.

    Mirrors crawler.ts:895-958 including: empty/whitespace rejection, optional
    query stripping/sorting/www-stripping, absolutize→normalize via the
    URI.js-compatible algebra, depth = referrer.depth + 1.
    """
    if referrer_url is None:
        referrer_url = initial_url
        referrer_depth = 0
    if referrer_depth is None:
        referrer_depth = 0

    if not url or not js_trim(url):
        return None

    try:
        if opts.strip_querystring:
            u = Uri(url)
            u.set_search("")
            url = u.href()

        if opts.sort_query_parameters:
            u = Uri(url)
            data = parse_query(u.query_)
            u.query_ = build_query(sort_query_keys(data)) or None
            url = u.href()

        if opts.strip_www_domain and _RE_WWW.search(url):
            url = url.replace("www.", "", 1)

        new_url = Uri(url).absolute_to(referrer_url).normalize()
        if opts.url_encoding == "iso8859":
            new_url = new_url.iso8859()
    except Exception:
        return None

    port_s = new_url.port()
    return {
        "host": new_url.hostname(),
        "path": new_url.resource(),
        "port": int(port_s) if port_s else 0,
        "protocol": new_url.protocol() or "http",
        "uri_path": new_url.path(),
        "url": new_url.href(),
        "depth": referrer_depth + 1,
        "referrer": referrer_url,
        "fetched": False,
        "status": "created",
    }
