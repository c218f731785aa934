"""Driver-OOM guard: record_fetch_log auto-switches to the distributed due
path when a wave's due set exceeds ``fetch_log_max_due`` (VERDICT r1 "What's
wrong" #5 — the default True must not be a driver collect trap at scale)."""

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df

BASE = "http://127.0.0.1:3000"


def _run(spark, pages, **kw):
    c = WaveCrawler(spark, pages, CrawlerConfig(
        initial_url=BASE + "/", respect_robots_txt=False, **kw))
    c.run()
    return c


def test_overflow_switches_to_distributed(spark):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    ref = _run(spark, pages)
    capped = _run(spark, pages, fetch_log_max_due=1)
    assert not ref._fetch_log_overflow
    assert capped._fetch_log_overflow
    # the log stops at the overflow wave but the crawl result is identical
    assert len(capped.fetch_log) < len(ref.fetch_log)
    def rows(c):
        return sorted((r.asDict(recursive=True) for r in c.frontier.collect()),
                      key=lambda d: d["id"])
    assert rows(ref) == rows(capped)
    assert capped.events == ref.events
    pages.unpersist()
