"""Golden canonicalization/validity tests, transliterated from
/root/reference/test/specs/resourcevalidity.integration.spec.ts and
queue.integration.spec.ts:335-344."""

import pathlib

from simplecrawler_spark.functions.decode import (decode_buffer,
                                                  mime_type_supported,
                                                  protocol_supported, unzip)
from simplecrawler_spark.functions.filters import DomainRules, domain_valid
from simplecrawler_spark.functions.urlkit import UrlOptions, process_url

FIXDIR = pathlib.Path("/root/reference/test/fixtures")


def purl(url, referrer=None, depth=None, opts=UrlOptions(), initial="http://example.com"):
    return process_url(url, referrer, depth, opts, initial_url=initial)


# --- domainValid matrix (spec :22-115) --------------------------------------

def test_domain_in_crawl_scope():
    r = DomainRules(host="example.com")
    assert domain_valid("example.com", r)
    assert not domain_valid("somethingelse", r)
    assert not domain_valid("microsoft.com", r)
    assert not domain_valid("a.really.complex.fqdn.", r)


def test_subdomains():
    r = DomainRules(host="example.com", scan_subdomains=True)
    assert domain_valid("example.com", r)
    assert domain_valid("www.example.com", r)
    assert domain_valid("testing.example.com", r)
    assert domain_valid("system.cache.example.com", r)
    assert not domain_valid("com.example", r)
    assert not domain_valid("example.com.au", r)
    assert not domain_valid("example.us", r)


def test_www_alike_by_default():
    r = DomainRules(host="example.com", scan_subdomains=False)
    assert domain_valid("example.com", r)
    assert domain_valid("www.example.com", r)


def test_www_separate_if_requested():
    r = DomainRules(host="example.com", scan_subdomains=False, ignore_www_domain=False)
    assert domain_valid("example.com", r)
    assert not domain_valid("www.example.com", r)


def test_domain_whitelist():
    r = DomainRules(host="example.com",
                    domain_whitelist=["foo.com", "bar.com", "abcdefg.net.nz"])
    assert domain_valid("example.com", r)
    assert domain_valid("foo.com", r)
    assert domain_valid("bar.com", r)
    assert domain_valid("abcdefg.net.nz", r)
    assert not domain_valid("wumpus.com", r)
    assert not domain_valid("fish.net", r)


# --- processURL canonicalization (spec :117-206) -----------------------------

def test_strip_www():
    assert purl("http://www.example.com",
                opts=UrlOptions(strip_www_domain=True))["host"] == "example.com"
    assert purl("http://example.com",
                opts=UrlOptions(strip_www_domain=True))["host"] == "example.com"
    assert purl("http://www.example.com")["host"] == "www.example.com"


def test_strip_querystring():
    o = UrlOptions(strip_querystring=True)
    assert purl("http://example.com/example?q=crawler", opts=o)["path"] == "/example"
    assert purl("http://example.com/test?q=crawler&foo=bar", opts=o)["path"] == "/test"
    assert purl("http://example.com/example?q=crawler")["path"] == "/example?q=crawler"
    assert purl("http://example.com/test?q=crawler&foo=bar")["path"] == "/test?q=crawler&foo=bar"


def test_sort_query_parameters():
    o = UrlOptions(sort_query_parameters=True)
    assert purl("http://example.com/example?s=1&r=9&b=3&r=2&r=7", opts=o)["path"] == \
        "/example?b=3&r=9&r=2&r=7&s=1"
    assert purl("http://example.com/test?q=crawler&foo=bar", opts=o)["path"] == \
        "/test?foo=bar&q=crawler"
    # urijs normalize() groups duplicate query keys even without sorting
    assert purl("http://example.com/example?s=1&r=9&b=3&r=2&r=7")["path"] == \
        "/example?s=1&r=9&r=2&r=7&b=3"
    assert purl("http://example.com/test?q=crawler&foo=bar")["path"] == \
        "/test?q=crawler&foo=bar"


def test_junk_urls():
    ctx = "http://www.example.com"
    assert purl("", ctx, 1) is None
    assert purl("\n\n", ctx, 1) is None
    assert purl("ur34nfie4985:s////dsf/", ctx, 1) is None


def test_process_without_referrer():
    item = purl("/stage2", initial="http://127.0.0.1:3000")
    assert item["url"] == "http://127.0.0.1:3000/stage2"
    assert item["depth"] == 1

    item = purl("http://example.com/blurp", initial="http://127.0.0.1:3000")
    assert item["url"] == "http://example.com/blurp"
    assert item["depth"] == 1

    item = purl("/test", "http://example.com", 2)
    assert item["url"] == "http://example.com/test"
    assert item["depth"] == 3


def test_sorted_query_dedupes_reordered_urls():
    # queue.integration.spec.ts:335-344
    o = UrlOptions(sort_query_parameters=True)
    a = purl("http://127.0.0.1:3000/sample.jsp?a=1&b=2", opts=o)
    b = purl("http://127.0.0.1:3000/sample.jsp?b=2&a=1", opts=o)
    assert a["url"] == b["url"]


# --- protocol/mime matrices (spec :208-257) ----------------------------------

def test_protocols():
    for url in ("http://google.com", "https://google.com", "rss://google.com",
                "feed://google.com", "atom://google.com"):
        assert protocol_supported(url)
    for url in ("gopher://google.com", "ws://google.com", "wss://google.com"):
        assert not protocol_supported(url)


def test_mimetypes():
    extra = ("image/png",)
    for mt in ("text/plain", "text/SomeFormat", "text/html", "application/rss+xml",
               "application/html+xml", "application/xhtml+xml",
               "application/javascript", "xml/manifest"):
        assert mime_type_supported(mt)
    assert mime_type_supported("image/png", extra)
    for mt in ("application/octet-stream", "img/png", "video/webm", "blah/blah"):
        assert not mime_type_supported(mt, extra)


# --- charset decode goldens (spec :269-296) ----------------------------------

def test_decode_header_charset():
    body = (FIXDIR / "encoded.html").read_bytes()
    out = decode_buffer(body, "text/html; charset=ISO-8859-1")
    assert out.strip() == "Eyjafjallajökull er fimmti stærsti jökull Íslands."


def test_decode_inline_charset():
    body = (FIXDIR / "inline-encoding.html").read_bytes()
    out = decode_buffer(body, "text/html")
    assert out.strip() == ('<meta charset="iso-8859-1"><p>Pippi Långstrump är en av '
                           'Astrid Lindgrens mest kända litterära figurer.<p>')


def test_decode_old_inline_charset():
    body = (FIXDIR / "old-inline-encoding.html").read_bytes()
    out = decode_buffer(body, "text/html")
    assert out.strip() == ('<meta http-equiv="Content-Type" content="text/html; '
                           'charset=iso-8859-1" /><p>Preikestolen er et fjellplatå '
                           'på nordsiden av Lysefjorden i Forsand.<p>')


def test_decode_empty():
    assert decode_buffer(b"", "text/html") == ""


# --- gzip/deflate goldens (spec :298-342) ------------------------------------

def test_unzip_gzip():
    import gzip
    body, err = unzip(gzip.compress(b"Yay, you know how to deal with gzip compression!"))
    assert err is None
    assert body == b"Yay, you know how to deal with gzip compression!"


def test_unzip_deflate():
    import zlib
    body, err = unzip(zlib.compress(b"Yay, you know how to deal with deflate compression!"))
    assert err is None
    assert body == b"Yay, you know how to deal with deflate compression!"


def test_unzip_garbage_errors():
    body, err = unzip(b"definitely not compressed")
    assert body is None and err
