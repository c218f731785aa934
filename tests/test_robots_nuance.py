"""robots-parser surface breadth (VERDICT r1 missing #5): crawl-delay,
isExplicitlyDisallowed (no '*' fallback), Host directive, getSitemaps.
Pure-python unit tests — no Spark session needed.

Semantics per the public npm robots-parser (v2.x) README/tests, which the
reference consumes via src/types/robots-parser.d.ts."""

from simplecrawler_spark.functions.robots import parse_robots

BODY = """\
User-agent: *
Disallow: /private
Crawl-delay: 10

User-agent: specialbot
Disallow: /special
Crawl-delay: 2.5

Host: www.example.com
Sitemap: http://example.com/sitemap.xml
Sitemap: /other.xml
"""


def _rf():
    return parse_robots("http://example.com/robots.txt", BODY)


def test_crawl_delay_per_agent_and_fallback():
    rf = _rf()
    assert rf.get_crawl_delay("specialbot/1.0") == 2.5
    assert rf.get_crawl_delay("otherbot") == 10.0
    empty = parse_robots("http://example.com/robots.txt", "User-agent: *\n")
    assert empty.get_crawl_delay("anybot") is None


def test_is_explicitly_disallowed_ignores_star_group():
    rf = _rf()
    # /private is disallowed for everyone — but only via the '*' group,
    # which does not count as "explicit" for a named agent
    assert rf.is_allowed("http://example.com/private", "otherbot") is False
    assert rf.is_explicitly_disallowed(
        "http://example.com/private", "otherbot") is False
    # specialbot has its own group: /special is explicit for it
    assert rf.is_explicitly_disallowed(
        "http://example.com/special/x", "specialbot/2.0") is True
    assert rf.is_explicitly_disallowed(
        "http://example.com/ok", "specialbot/2.0") is False
    # off-origin: no verdict
    assert rf.is_explicitly_disallowed(
        "http://elsewhere.com/special", "specialbot") is None


def test_is_disallowed_inverts_is_allowed():
    rf = _rf()
    assert rf.is_disallowed("http://example.com/private/x") is True
    assert rf.is_disallowed("http://example.com/pub") is False
    assert rf.is_disallowed("https://example.com/private") is None  # port 443


def test_host_and_sitemaps():
    rf = _rf()
    assert rf.get_preferred_host() == "www.example.com"
    assert rf.get_sitemaps() == ["http://example.com/sitemap.xml",
                                 "/other.xml"]


def test_crawl_delay_non_numeric_ignored():
    rf = parse_robots("http://example.com/robots.txt",
                      "User-agent: *\nCrawl-delay: soon\n")
    assert rf.get_crawl_delay() is None
