"""Live-fetch mode: the reference crawl goldens over REAL sockets.

serve_fixture replays test/util/routes.ts over HTTP on 127.0.0.1:3000; the
crawler runs with live_fetch=True (mapInPandas batched HTTP, no pages
join) and must reproduce the 8-fetchstart main-crawl golden
(reliability.integration.spec.ts:222-246), final statuses, robots gating,
redirect requeue, gzip decode, conditional-request 304s and the timeout
branch — byte-identical to the simulated fetch path.
"""

import pytest

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.liveserver import serve_fixture

BASE = "http://127.0.0.1:3000"


@pytest.fixture(scope="module")
def server():
    try:
        srv = serve_fixture(3000, hang_seconds=3.0)
    except OSError:
        pytest.skip("port 3000 unavailable")
    yield srv
    srv.shutdown()


def _frontier_map(c):
    rows = c.frontier.orderBy("id").collect()
    return {r["url"]: (r["status"], r["fetched"]) for r in rows}


def test_live_main_crawl_golden(spark, server):
    c = WaveCrawler(spark, None, CrawlerConfig(
        initial_url=BASE + "/", live_fetch=True))
    c.run()
    urls = [u for (_, _, u) in c.fetch_log]
    assert urls == [
        BASE + "/", BASE + "/sitemap.xml", BASE + "/stage2",
        BASE + "/stage/3", BASE + "/stage/4", BASE + "/stage5",
        BASE + "/stage6", BASE + "/nofollow",
    ]
    fm = {u: s for u, (s, _) in _frontier_map(c).items()}
    assert fm == {
        BASE + "/": "downloaded",
        BASE + "/sitemap.xml": "notfound",
        BASE + "/stage2": "downloaded",
        BASE + "/stage/3": "downloaded",
        BASE + "/stage/4": "downloaded",
        BASE + "/stage5": "redirected",
        BASE + "/stage6": "downloaded",
        BASE + "/nofollow": "downloaded",
    }
    assert c.events.get("cookieerror", 0) == 1   # '=test' cookie
    assert c.events.get("downloaded", 0) == 6
    # gzip body over the wire decodes identically
    c2 = WaveCrawler(spark, None, CrawlerConfig(
        initial_url=BASE + "/compressed/gzip", live_fetch=True))
    c2.run()
    row = c2.content.filter(f"url = '{BASE}/compressed/gzip'").collect()[0]
    assert row["extracted_text"] == \
        "Yay, you know how to deal with gzip compression!"


def test_live_multi_origin_robots(spark, server):
    """Executor-side robots fetch over real sockets with >1 origin: the
    cross-port golden (testcrawl.integration.spec.ts:149-175) plus a
    two-origins-in-one-batch seed — the driver does no HTTP."""
    try:
        srv2 = serve_fixture(3001)
    except OSError:
        pytest.skip("port 3001 unavailable")
    try:
        c = WaveCrawler(spark, None, CrawlerConfig(
            initial_url=BASE + "/to/other/port", live_fetch=True,
            filter_by_domain=False))
        c.run()
        fm = {u: s for u, (s, _) in _frontier_map(c).items()}
        assert fm["http://127.0.0.1:3001/disallowed"] == "disallowed"
        assert "http://127.0.0.1:3001/disallowed" not in \
            [u for (_, _, u) in c.fetch_log]
        assert len(c.robots.files) == 2   # both origins' robots parsed

        # two new origins in ONE wave batch (localhost + 127.0.0.1)
        c2 = WaveCrawler(spark, None, CrawlerConfig(
            initial_url=BASE + "/stage7", live_fetch=True,
            filter_by_domain=False))
        c2.seed([BASE + "/stage7", "http://localhost:3000/stage7"])
        c2.run()
        fm2 = {u: s for u, (s, _) in _frontier_map(c2).items()}
        assert fm2[BASE + "/stage7"] == "downloaded"
        assert fm2["http://localhost:3000/stage7"] == "downloaded"
        assert len(c2.robots.files) == 2
    finally:
        srv2.shutdown()


def test_live_timeout_and_304(spark, server):
    # C4: socket timeout -> 'timeout' status
    c = WaveCrawler(spark, None, CrawlerConfig(
        initial_url=BASE + "/timeout", live_fetch=True, timeout_ms=1000,
        respect_robots_txt=False))
    c.run()
    assert _frontier_map(c)[BASE + "/timeout"] == ("timeout", True)
    assert c.events.get("timeout", 0) == 1

    # S8: conditional request answered 304 by the real server
    cache = spark.createDataFrame(
        [(BASE + "/etag", "\"3c1ceb-13e84-5893853673580;589c03961f340\"",
          None)], "url string, etag string, last_modified string")
    c2 = WaveCrawler(spark, None, CrawlerConfig(
        initial_url=BASE + "/etag", live_fetch=True,
        respect_robots_txt=False), cache=cache)
    c2.run()
    assert c2.events.get("notmodified", 0) == 1
    assert _frontier_map(c2)[BASE + "/etag"] == ("spooled", True)
