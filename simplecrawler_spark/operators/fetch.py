"""Live HTTP fetch stage — the real-socket analog of frontier⨝pages (S1).

``live_fetch_stage(due, config, jar, cache)`` maps the due frontier rows
through a batched HTTP fetch in an Arrow pass: each executor task drains
its batch with a thread pool capped at ``config.max_concurrency`` (the C2
concurrency cap, /root/reference/src/crawler.ts:303 — per executor, the
wave's politeness budget remains the global rate limiter via select_due),
sends the same headers getRequestOptions would (crawler.ts:748-836: UA,
Accept, Accept-Encoding, Referer, cookie header from the jar, conditional
If-None-Match / If-Modified-Since from the cache table), never follows
redirects (the wave engine requeues them, R1), never auto-decompresses
(the body pipeline owns T2), and emits EXACTLY the column layout the
simulated pages join produces — downstream status branching, body
pipeline and enqueue are byte-identical between the two fetch modes.

Error mapping mirrors the reference: socket timeout → ``_hang`` (the
"timeout" status branch, C4); connection errors → code 600
(fetcherror/"failed", crawler.ts:1663-1680 R4).
"""

from __future__ import annotations

import socket
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlerConfig
from ..functions.cookies import CookieJar

_ACCEPT = "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"

_RESP_COLS = ["_code", "html", "_ctype", "_cenc", "_clen", "_location",
              "_set_cookie", "_etag", "_lastmod", "_hang"]


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None  # the crawler requeues redirects itself (R1)


def make_live_fetcher(config: CrawlerConfig, cookies: list):
    """mapInPandas kernel: due rows (+ __etag/__lm) → due rows + response
    columns. ``cookies`` is the driver jar's cookie list (closure-shipped,
    same as the request-options builder)."""
    timeout = config.timeout_ms / 1000.0
    max_conc = max(int(config.max_concurrency), 1)
    ua = config.user_agent
    decompress = config.decompress_responses
    accept_cookies = config.accept_cookies
    max_read = config.max_resource_size
    custom = dict(config.custom_headers or {})

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        opener = urllib.request.build_opener(_NoRedirect)
        jar = CookieJar()
        jar.cookies = list(cookies)

        def one(args):
            url, host, path, referrer, etag, lm = args
            headers = {"Accept": _ACCEPT, "User-Agent": ua}
            if decompress:
                headers["Accept-Encoding"] = "gzip, deflate"
            if referrer:
                headers["Referer"] = referrer
            if accept_cookies:
                headers["Cookie"] = "; ".join(jar.get_as_header(host, path))
            if etag is not None and pd.notna(etag):
                headers["If-None-Match"] = etag
            if lm is not None and pd.notna(lm):
                headers["If-Modified-Since"] = lm
            headers.update(custom)
            try:
                req = urllib.request.Request(url, headers=headers)
                with opener.open(req, timeout=timeout) as resp:
                    body = resp.read(max_read + 1)
                    h = resp.headers
                    clen = h.get("Content-Length")
                    return (resp.status, bytes(body), h.get("Content-Type"),
                            h.get("Content-Encoding"),
                            int(clen) if clen is not None else len(body),
                            h.get("Location"), h.get("Set-Cookie"),
                            h.get("ETag"), h.get("Last-Modified"), False)
            except urllib.error.HTTPError as e:
                body = e.read() if e.fp is not None else b""
                h = e.headers
                clen = h.get("Content-Length")
                return (e.code, bytes(body), h.get("Content-Type"),
                        h.get("Content-Encoding"),
                        int(clen) if clen is not None else len(body),
                        h.get("Location"), h.get("Set-Cookie"),
                        h.get("ETag"), h.get("Last-Modified"), False)
            except (TimeoutError, socket.timeout):
                return (600, b"", None, None, 0, None, None, None, None, True)
            except urllib.error.URLError as e:
                hang = isinstance(getattr(e, "reason", None),
                                  (TimeoutError, socket.timeout))
                return (600, b"", None, None, 0, None, None, None, None, hang)
            except Exception:
                return (600, b"", None, None, 0, None, None, None, None, False)

        for pdf in batches:
            args = list(zip(pdf["url"], pdf["host"], pdf["path"],
                            pdf["referrer"], pdf["__etag"], pdf["__lm"]))
            if len(args) == 1:
                results = [one(args[0])]
            else:
                with ThreadPoolExecutor(max_conc) as ex:  # C2 cap
                    results = list(ex.map(one, args))
            out = pdf.drop(columns=["__etag", "__lm"]).copy()
            for j, col in enumerate(_RESP_COLS):
                out[col] = [r[j] for r in results]
            yield out

    return fetch


def make_live_robots_fetcher(config: CrawlerConfig, rules):
    """mapInPandas kernel for live robots.txt fetches: (origin, url) rows →
    (origin, body, rules_json, crawl_delay, sitemaps) rows — the robots
    PARSE happens here too, so the driver registers finished fields without
    per-origin parsing (same contract as the simulated batch kernel). Each
    row follows its OWN redirect chain inside the kernel (≤6 hops,
    domain-gated with ``rules`` exactly like the simulated batch —
    getRobotsTxt semantics, /root/reference/src/crawler.ts:1368-1473), so
    the whole fan-out runs executor-side: the driver does no HTTP. Rows
    in a batch are drained by a thread pool capped at ``max_concurrency``
    (the C2 cap, per executor)."""
    from ..functions.decode import decode_buffer, unzip
    timeout = config.timeout_ms / 1000.0
    max_conc = max(int(config.max_concurrency), 1)
    ua = config.user_agent

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.filters import domain_valid
        from ..functions.uriref import Uri
        opener = urllib.request.build_opener(_NoRedirect)

        def one(args):
            origin, url = args
            for _hop in range(6):
                try:
                    req = urllib.request.Request(
                        url, headers={"User-Agent": ua})
                    with opener.open(req, timeout=timeout) as resp:
                        body, code, h = resp.read(), resp.status, resp.headers
                except urllib.error.HTTPError as e:
                    body = e.read() if e.fp is not None else b""
                    code, h = e.code, e.headers
                except Exception:
                    return origin, None
                ctype, cenc = h.get("Content-Type"), h.get("Content-Encoding")
                if 200 <= code < 300:
                    if "gzip" in (cenc or "") or "deflate" in (cenc or ""):
                        body, err = unzip(body)
                        if err:
                            return origin, None
                    return origin, decode_buffer(body, ctype or "")
                if 300 <= code < 400 and h.get("Location"):
                    try:
                        target = Uri(h.get("Location")) \
                            .absolute_to(url).normalize()
                    except Exception:
                        return origin, None
                    if not domain_valid(target.hostname(), rules):
                        return origin, None
                    url = target.href()
                    continue
                return origin, None
            return origin, None

        import json as _json
        from ..functions.robots import parse_robots as _parse
        for pdf in batches:
            args = list(zip(pdf["origin"], pdf["url"]))
            if len(args) == 1:
                results = [one(args[0])]
            else:
                with ThreadPoolExecutor(max_conc) as ex:
                    results = list(ex.map(one, args))
            rjs, delays, sitemaps = [], [], []
            for origin, body in results:
                if body is None:
                    rjs.append(None)
                    delays.append(None)
                    sitemaps.append(None)
                    continue
                # parse scoped to the ORIGIN's robots url (a redirected
                # robots file still gates the origin that asked for it)
                rf = _parse(origin + "/robots.txt", body)
                rjs.append(rf.rules_payload(ua))
                delays.append(rf.get_crawl_delay(ua))
                sitemaps.append(_json.dumps(rf.sitemaps)
                                if rf.sitemaps else None)
            yield pd.DataFrame({"origin": [r[0] for r in results],
                                "body": [r[1] for r in results],
                                "rules_json": rjs,
                                "crawl_delay": delays,
                                "sitemaps": sitemaps})

    return fetch


def live_fetch_stage(due: DataFrame, config: CrawlerConfig,
                     jar: Optional[CookieJar] = None,
                     cache: Optional[DataFrame] = None) -> DataFrame:
    """due frontier rows → response rows with the simulated-join layout.
    ``cache`` (url, etag, last_modified) drives conditional requests (S8) —
    the server answers 304 directly, so no post-join rewrite is needed."""
    if cache is not None:
        due = due.join(
            F.broadcast(cache.select("url", F.col("etag").alias("__etag"),
                                     F.col("last_modified").alias("__lm"))),
            "url", "left")
    else:
        due = due.withColumn("__etag", F.lit(None).cast("string")) \
                 .withColumn("__lm", F.lit(None).cast("string"))
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in due.schema.fields if f.name not in ("__etag", "__lm")]
        + ["_code int", "html binary", "_ctype string", "_cenc string",
           "_clen long", "_location string", "_set_cookie string",
           "_etag string", "_lastmod string", "_hang boolean"])
    cookies = list(jar.cookies) if jar is not None else []
    return due.mapInPandas(make_live_fetcher(config, cookies), schema)
