"""Request-options projection (T3) — getRequestOptions re-expressed.

Parity target: /root/reference/src/crawler.ts:748-836. Builds, per frontier
row, the http(s).request options the reference would send: method, host,
port (dropped for 80/443/absent), path, and a headers map — Accept,
User-Agent, Host (":port" appended only for a NON-default port, matching
the reference's observable behavior), Accept-Encoding when
decompress_responses, Referer when a referrer exists, cookie header from
the jar (domain-suffix + path-prefix + expiry filtered, '; '-joined),
Basic auth / proxy rewrite / custom headers from config.

One Arrow pass (mapInPandas); the cookie jar is shipped as a plain list in
the closure (small driver-side state, exactly like the reference's jar).
"""

from __future__ import annotations

import base64
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .cookies import CookieJar

REQUEST_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("req_host", T.StringType()),
    T.StructField("req_port", T.IntegerType()),   # null ⇒ default (80/443)
    T.StructField("req_path", T.StringType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])

_ACCEPT = "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"


def request_options(frontier: DataFrame, config,
                    jar: Optional[CookieJar] = None,
                    cache: Optional[DataFrame] = None) -> DataFrame:
    """(url, method, req_host, req_port, req_path, headers) per row."""
    cookies = list(jar.cookies) if jar is not None else []
    ua = config.user_agent
    decompress = config.decompress_responses
    accept_cookies = config.accept_cookies
    auth_user = getattr(config, "auth_user", None)
    auth_pass = getattr(config, "auth_pass", None)
    custom = dict(getattr(config, "custom_headers", None) or {})
    proxy_host = getattr(config, "proxy_hostname", None)
    proxy_port = getattr(config, "proxy_port", None)

    pruned = frontier.select("url", "protocol", "host", "port", "path",
                             "referrer")
    # S8: conditional-request headers from a previous crawl's cache table
    if cache is not None:
        pruned = pruned.join(
            F.broadcast(cache.select("url",
                                     F.col("etag").alias("__etag"),
                                     F.col("last_modified").alias("__lm"))),
            "url", "left")
    else:
        pruned = pruned.withColumn("__etag", F.lit(None).cast("string")) \
                       .withColumn("__lm", F.lit(None).cast("string"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmp_jar = CookieJar()
        tmp_jar.cookies = list(cookies)
        for b in batches:
            out: List[dict] = []
            for url, protocol, host, port, path, referrer, etag, lm in zip(
                    b["url"], b["protocol"], b["host"], b["port"], b["path"],
                    b["referrer"], b["__etag"], b["__lm"]):
                port = int(port) if pd.notna(port) and port else 0
                is_nondefault = (protocol == "http" and port != 80) or \
                                (protocol == "https" and port != 443)
                headers = {
                    "Accept": _ACCEPT,
                    "User-Agent": ua,
                    "Host": host + (f":{port}" if port and is_nondefault
                                    else ""),
                }
                if decompress:
                    headers["Accept-Encoding"] = "gzip, deflate"
                if referrer:
                    headers["Referer"] = referrer
                if accept_cookies:
                    # crawler.ts:793-797 — `getAsHeader()` returns an array,
                    # always truthy in JS, so the header is set (possibly
                    # empty) whenever acceptCookies is on
                    headers["cookie"] = "; ".join(
                        tmp_jar.get_as_header(host, path))
                if auth_user is not None and auth_pass is not None:
                    headers["Authorization"] = "Basic " + base64.b64encode(
                        f"{auth_user}:{auth_pass}".encode()).decode()
                if etag and pd.notna(etag):
                    headers["If-None-Match"] = etag
                if lm and pd.notna(lm):
                    headers["If-Modified-Since"] = lm
                headers.update(custom)
                req_host, req_port, req_path = host, port, path
                if proxy_host:
                    req_host, req_port, req_path = proxy_host, proxy_port, url
                out.append({
                    "url": url, "method": "GET", "req_host": req_host,
                    "req_port": None if req_port in (80, 443, 0, None)
                    else int(req_port),
                    "req_path": req_path, "headers": headers})
            yield pd.DataFrame(out, columns=[f.name for f in REQUEST_SCHEMA])

    return pruned.mapInPandas(build, REQUEST_SCHEMA)
