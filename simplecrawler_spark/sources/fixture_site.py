"""The reference's live test HTTP site as a deterministic pages table.

Every route of /root/reference/test/util/routes.ts:12-214 becomes one row per
host that serves it; "fetching" in the engine is a join frontier→pages on
``url``. URLs missing from the table are synthesized as 404 rows with body
"Page not found." (testserver.ts:66-71 behavior, no Content-Type header).

Bodies are verbatim from routes.ts / test/fixtures/*; the encoded fixtures
are embedded as ISO-8859-1 byte strings so the repo is standalone.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Dict, List, Optional

from pyspark.sql import types as T

__all__ = ["fixture_pages_rows", "fixture_pages_df", "PAGES_SCHEMA",
           "NOT_FOUND_BODY", "ROBOTS_TXT_3000", "ROBOTS_TXT_3001"]

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_encoding", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("location", T.StringType()),
    T.StructField("set_cookie", T.StringType()),
    T.StructField("etag", T.StringType()),
    T.StructField("last_modified", T.StringType()),
    T.StructField("hang", T.BooleanType()),
])

NOT_FOUND_BODY = b"Page not found."
ROBOTS_TXT_3000 = "User-agent: *\nDisallow: /forbidden\nSitemap: /sitemap.xml\n"
ROBOTS_TXT_3001 = "User-agent: *\nDisallow: /disallowed\n"

# test/fixtures/encoded.html — ISO-8859-1 bytes
_ENCODED_HEADER = ("Eyjafjallajökull er fimmti stærsti jökull "
                   "Íslands.\n").encode("iso8859-1")
_ENCODED_INLINE = ("<meta charset=\"iso-8859-1\"><p>Pippi Långstrump "
                   "är en av Astrid Lindgrens mest kända "
                   "litterära figurer.<p>\n").encode("iso8859-1")
_ENCODED_OLD_INLINE = ("<meta http-equiv=\"Content-Type\" content=\"text/html; "
                       "charset=iso-8859-1\" /><p>Preikestolen er et "
                       "fjellplatå på nordsiden av Lysefjorden i "
                       "Forsand.<p>\n").encode("iso8859-1")


def _gzip0(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)


def _row(url: str, status: int = 200, body=b"", content_type: Optional[str] = "text/html",
         content_encoding: Optional[str] = None, location: Optional[str] = None,
         set_cookie: Optional[str] = None, etag: Optional[str] = None,
         last_modified: Optional[str] = None, hang: bool = False) -> Dict:
    if isinstance(body, str):
        body = body.encode("utf-8")
    return dict(url=url, status=status, html=body, content_type=content_type,
                content_encoding=content_encoding, content_length=len(body),
                location=location, set_cookie=set_cookie, etag=etag,
                last_modified=last_modified, hang=hang)


def _routes_3000(base: str) -> List[Dict]:
    """routes.ts:12-214, one row per path, absolutized against ``base``."""
    r = []
    r.append(_row(base + "/", body="Home. <a href='stage2'>stage2</a> <a href='forbidden'>bad robot!</a>"))
    r.append(_row(base + "/robots.txt", body=ROBOTS_TXT_3000))
    r.append(_row(base + "/forbidden", body="You shouldn't be poking around in here"))
    r.append(_row(base + "/stage2", body="Stage2. http://127.0.0.1:3000/stage/3",
                  set_cookie="=test; path=/stage2; domain=test.com"))
    r.append(_row(base + "/stage/3", body="Stage3. <a href='//127.0.0.1:3000/stage/4'>stage4</a>"))
    r.append(_row(base + "/stage/4", body="Stage4. <a href='../stage5'>stage5</a>"))
    r.append(_row(base + "/stage5", status=301, body="Redirecting you to /stage6",
                  content_type="text/plain", location="/stage6"))
    r.append(_row(base + "/stage6", body="<a href='nofollow'>Go to me, but no further!</a>"))
    r.append(_row(base + "/stage7", body="Crawl complete!"))
    r.append(_row(base + "/nofollow",
                  body="<meta name='robots' content='nofollow'><a href='/stage7'>Don't go here!</a>"))
    r.append(_row(base + "/cookie", body="<a href='/stage7'>Link</a>",
                  set_cookie="thing=stuff; expires=Fri, 01 Jan 2100 00:00:00 GMT; path=/; domain=.localhost"))
    r.append(_row(base + "/async-stage1", body="http://127.0.0.1:3000/async-stage2"))
    r.append(_row(base + "/async-stage2", body="http://127.0.0.1:3000/async-stage3"))
    r.append(_row(base + "/async-stage3", body="Complete!"))
    r.append(_row(base + "/timeout", hang=True))
    r.append(_row(base + "/timeout2", hang=True))
    r.append(_row(base + "/domain-redirect", status=301,
                  body="Redirecting you to http://localhost:3000/",
                  content_type="text/plain", location="http://localhost:3000/"))
    r.append(_row(base + "/domain-redirect2", status=301,
                  body="Redirecting you to http://localhost:3000/domain-redirect",
                  content_type="text/plain", location="http://localhost:3000/domain-redirect"))
    r.append(_row(base + "/to-domain-redirect", body="<a href='/domain-redirect'>redirect</a>"))
    r.append(_row(base + "/depth/1", body="<link rel='stylesheet' href='/css'> Home. <a href='/depth/2'>depth2</a>"))
    r.append(_row(base + "/depth/2", body="Depth 2. http://127.0.0.1:3000/depth/3"))
    r.append(_row(base + "/depth/3",
                  body="Depth 3. <link rel='stylesheet' href='/css/2'> <link rel='stylesheet' href='/css/4'>"))
    r.append(_row(base + "/css", content_type="text/css",
                  body="/* CSS 1 */ @import url('/css/2'); @font-face { url(/font/1) format('woff'); }"))
    r.append(_row(base + "/css/2", content_type="text/css",
                  body="/* CSS 2 */ @import url('/css/3'); .img1 { background-image:url('/img/1'); }"))
    r.append(_row(base + "/css/3", content_type="text/css", body="/* CSS 3 */"))
    r.append(_row(base + "/css/4", content_type="text/css",
                  body="/* CSS 4 */ .img1 { background-image:url('/img/2'); } @font-face { url(/font/2) format('woff'); }"))
    r.append(_row(base + "/img/1", content_type="image/png", body=""))
    r.append(_row(base + "/img/2", content_type="image/png", body=""))
    r.append(_row(base + "/font/1", content_type="font/woff", body=""))
    r.append(_row(base + "/font/2", content_type="application/font-woff", body=""))
    r.append(_row(base + "/404", status=404, body="page not found"))
    r.append(_row(base + "/410", status=410, body="this page no longer exists!"))
    r.append(_row(base + "/etag", body="",
                  etag="\"3c1ceb-13e84-5893853673580;589c03961f340\""))
    r.append(_row(base + "/last-modified", body="",
                  last_modified="Sun, 19 May 2019 07:11:34 GMT"))
    r.append(_row(base + "/script",
                  body="<script src='/not/existent/file.js'></script><script>var foo = 'bar';"
                       "</script><a href='/stage2'>stage2</a><script>var bar = 'foo';</script>"))
    r.append(_row(base + "/to/other/port", body="<a href='//127.0.0.1:3001/disallowed'>Don't go there!</a>"))
    r.append(_row(base + "/encoded/header", body=_ENCODED_HEADER,
                  content_type="text/html; charset=ISO-8859-1"))
    r.append(_row(base + "/encoded/inline", body=_ENCODED_INLINE))
    r.append(_row(base + "/encoded/old-inline", body=_ENCODED_OLD_INLINE))
    r.append(_row(base + "/encoded/empty", body=""))
    r.append(_row(base + "/compressed/link", content_encoding="gzip",
                  body=_gzip0(b"<a href='/compressed/gzip'>Go to gzip</a>")))
    r.append(_row(base + "/compressed/gzip", content_encoding="gzip",
                  body=_gzip0(b"Yay, you know how to deal with gzip compression!")))
    r.append(_row(base + "/compressed/deflate", content_encoding="deflate",
                  body=zlib.compress(b"Yay, you know how to deal with deflate compression!")))
    r.append(_row(base + "/big", body=b"\x00" * (1024 * 1024 * 17)))
    return r


def fixture_pages_rows(include_big: bool = False) -> List[Dict]:
    """All fixture rows. The same route map is served on both hostnames of
    the test box (127.0.0.1:3000 and localhost:3000 — one server), plus the
    second server on :3001 (testcrawl.integration.spec.ts:149-175)."""
    rows: List[Dict] = []
    for base in ("http://127.0.0.1:3000", "http://localhost:3000"):
        rows.extend(_routes_3000(base))
    rows.append(_row("http://127.0.0.1:3001/robots.txt", body=ROBOTS_TXT_3001))
    rows.append(_row("http://127.0.0.1:3001/disallowed", body="This is forbidden crawler fruit"))
    if not include_big:
        rows = [r for r in rows if not r["url"].endswith("/big")]
    return rows


def fixture_pages_df(spark, include_big: bool = False):
    return spark.createDataFrame(fixture_pages_rows(include_big), PAGES_SCHEMA)
