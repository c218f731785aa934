"""S6/S7 page-cache sink + T3 request-options goldens."""

import json
import os

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.functions.cookies import CookieJar
from simplecrawler_spark.functions.request import request_options
from simplecrawler_spark.sinks.pagecache import (cache_paths, read_fs_cache,
                                                 sanitise_path,
                                                 write_fs_cache)


# ------------------------------------------------------- sanitise_path (S6)
def test_sanitise_path_goldens():
    # cache-backend-fs.ts:20-69 semantics
    assert sanitise_path("", "text/html") == "index.html"
    assert sanitise_path("/", "text/html") == "index.html"
    assert sanitise_path("/about", "text/html") == "about.html"
    assert sanitise_path("/about.html", "text/html") == "about.html"
    assert sanitise_path("/style.css", "text/css") == "style.css"
    # querystring hashed (sha1 of everything after the first '?')
    import hashlib
    qs_hash = hashlib.sha1(b"a=1&b=2").hexdigest()
    got = sanitise_path("/p?a=1&b=2", None)
    assert got == f"p?{qs_hash}"
    # >=250-char segment hashed
    long_seg = "x" * 250
    got = sanitise_path(f"/a/{long_seg}/b.html", "text/html")
    assert hashlib.sha1(long_seg.encode()).hexdigest() in got
    # non-html mime gets subtype extension
    assert sanitise_path("/img", "image/png") == "img.png"
    assert sanitise_path("/dl", "application/pdf") == "dl.pdf"
    # server-processed html gets .html appended after existing ext
    assert sanitise_path("/page.php", "text/html") == "page.php.html"
    # trailing slash + html → index.html
    assert sanitise_path("/dir/", "text/html") == "dir/index.html"


def test_cache_paths_distributed(spark):
    df = spark.createDataFrame(
        [("http://a.test:8080/x?q=1", "http", "a.test", 8080, "/x?q=1")],
        "url string, protocol string, host string, port int, path string")
    row = cache_paths(df).first()
    assert row["cache_path"].startswith("http/a.test/8080/x?")


def test_write_and_read_fs_cache(spark, tmp_path):
    loc = str(tmp_path / "mirror")
    frontier = spark.createDataFrame(
        [("http://a.test/", "http", "a.test", 80, "/",
          {"content_type": "text/html",
           "headers": {"etag": "W/\"abc\"", "last-modified": "yesterday"}}),
         ("http://a.test/css/s.css", "http", "a.test", 80, "/css/s.css",
          {"content_type": "text/css", "headers": {}})],
        "url string, protocol string, host string, port int, path string, "
        "state struct<content_type:string,headers:map<string,string>>")
    content = spark.createDataFrame(
        [("http://a.test/", bytearray(b"<html>hi</html>")),
         ("http://a.test/css/s.css", bytearray(b"body{}"))],
        "url string, body binary")
    n = write_fs_cache(content, frontier, loc)
    assert n == 2
    assert open(os.path.join(loc, "http/a.test/80/index.html"), "rb") \
        .read() == b"<html>hi</html>"
    assert os.path.exists(
        os.path.join(loc, "http/a.test/80/index.html.cacheData.json"))
    idx = read_fs_cache(spark, loc)
    got = {r["url"]: r for r in idx.collect()}
    assert got["http://a.test/"]["etag"] == 'W/"abc"'
    assert got["http://a.test/"]["lastModified"] == "yesterday"


# ---------------------------------------------------- request options (T3)
@pytest.fixture
def frontier(spark):
    return spark.createDataFrame(
        [("http://a.test/p", "http", "a.test", 80, "/p", "http://a.test/"),
         ("http://a.test:8080/q", "http", "a.test", 8080, "/q", None),
         ("https://b.test/r", "https", "b.test", 443, "/r", "")],
        "url string, protocol string, host string, port int, path string, "
        "referrer string")


def test_request_headers_golden(spark, frontier):
    jar = CookieJar()
    jar.add("name=value; domain=a.test; path=/")
    jar.add("other=x; domain=c.test; path=/")
    cfg = CrawlerConfig(initial_url="http://a.test/",
                        custom_headers={"X-Custom": "1"})
    got = {r["url"]: r for r in
           request_options(frontier, cfg, jar=jar).collect()}

    r = got["http://a.test/p"]
    assert r["headers"]["Host"] == "a.test"          # default port: no suffix
    assert r["req_port"] is None                     # dropped like reference
    assert r["headers"]["Referer"] == "http://a.test/"
    assert r["headers"]["cookie"] == "name=value"    # domain-filtered
    assert r["headers"]["Accept-Encoding"] == "gzip, deflate"
    assert r["headers"]["X-Custom"] == "1"
    assert r["headers"]["User-Agent"].startswith("Node/simplecrawler")

    r2 = got["http://a.test:8080/q"]
    assert r2["headers"]["Host"] == "a.test:8080"    # non-default: suffixed
    assert r2["req_port"] == 8080
    assert "Referer" not in r2["headers"]

    r3 = got["https://b.test/r"]
    assert r3["headers"]["Host"] == "b.test"
    assert r3["headers"]["cookie"] == ""             # JS truthy-[] quirk


def test_request_auth_proxy_and_conditional(spark, frontier):
    cfg = CrawlerConfig(initial_url="http://a.test/", auth_user="u",
                        auth_pass="p", proxy_hostname="proxy.local",
                        proxy_port=3128, accept_cookies=False)
    cache = spark.createDataFrame(
        [("http://a.test/p", "W/\"42\"", "Tue, 01 Jan 2030 00:00:00 GMT")],
        "url string, etag string, last_modified string")
    got = {r["url"]: r for r in
           request_options(frontier, cfg, cache=cache).collect()}
    r = got["http://a.test/p"]
    import base64
    assert r["headers"]["Authorization"] == \
        "Basic " + base64.b64encode(b"u:p").decode()
    assert r["req_host"] == "proxy.local" and r["req_port"] == 3128
    assert r["req_path"] == "http://a.test/p"        # proxy rewrite
    assert r["headers"]["If-None-Match"] == 'W/"42"'
    assert r["headers"]["If-Modified-Since"].startswith("Tue")
    assert "cookie" not in r["headers"]
    assert "If-None-Match" not in got["https://b.test/r"]["headers"]
