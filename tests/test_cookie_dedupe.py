"""Set-Cookie driver-collect dedupe (scale guard).

With accept_cookies on (the default), a politeness budget of 10^5+ rows
per wave must NOT collect one Set-Cookie string per response: the jar
upsert is idempotent per distinct header, so the wave aggregates
groupBy(header).count() JVM-side and only (#distinct headers) rows reach
the driver — multiplicity preserved for the per-response cookieerror
counter (crawler.ts:1807-1813 emits once per response)."""

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import PAGES_SCHEMA


def test_cookie_collect_bounded_by_distinct_headers(spark, monkeypatch):
    n = 100_000
    good = ["a=1; path=/", "b=2; path=/", "c=3; domain=.h0.test"]
    bad = "=bad; path=/"  # empty name -> cookieerror per response
    body = F.encode(F.lit("x"), "utf-8")
    pages = spark.range(n).select(
        F.concat(F.lit("http://h0.test/p/"), F.col("id")).alias("url"),
        F.lit(200).alias("status"), body.alias("html"),
        F.lit("text/plain").alias("content_type"),
        F.lit(None).cast("string").alias("content_encoding"),
        F.lit(1).cast("long").alias("content_length"),
        F.lit(None).cast("string").alias("location"),
        F.when(F.col("id") % 10 == 9, F.lit(bad)).otherwise(
            F.element_at(F.array(*[F.lit(s) for s in good]),
                         (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")))
        .alias("set_cookie"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("last_modified"),
        F.lit(False).alias("hang"))
    pages = spark.createDataFrame(pages.rdd, PAGES_SCHEMA) \
        if pages.schema != PAGES_SCHEMA else pages

    captured = []
    orig = WaveCrawler._apply_set_cookies

    def spy(self, rows):
        captured.extend(rows)
        return orig(self, rows)

    monkeypatch.setattr(WaveCrawler, "_apply_set_cookies", spy)
    cfg = CrawlerConfig(initial_url="http://h0.test/p/0",
                        respect_robots_txt=False, record_fetch_log=False,
                        id_mode="composite", discover_resources=False)
    c = WaveCrawler(spark, pages, cfg, keep_content=False)
    c.seed_frontier(pages.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("id"),
        "url"))
    c.run_wave()

    # the driver saw at most one row per DISTINCT header, never per response
    assert len(captured) == len(good) + 1
    assert sum(cnt for (_h, cnt) in captured) == n
    # multiplicity preserved: every bad-header RESPONSE counts a cookieerror
    assert c.events.get("cookieerror", 0) == n // 10
    assert sorted(cookie.name for cookie in c.jar.cookies) == ["a", "b", "c"]
