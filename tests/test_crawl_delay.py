"""Robots ``Crawl-delay`` consumption (politeness nuance).

The reference parses crawl-delay via robots-parser but never consumes it
(nothing reads getCrawlDelay in /root/reference/src/crawler.ts) — the wave
engine, which advertises the nuance surface, feeds it into the per-host
politeness budget: a host whose robots.txt asks for one fetch per ``delay``
seconds gets min(config budget, wave_duration/delay) tokens per wave
(floored at 1 for liveness). Hosts without a delay are unaffected.
"""

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.operators.politeness import select_due
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import PAGES_SCHEMA, _row


def _delay_pages(spark, n_pages=16):
    rows = [
        _row("http://fast.test/robots.txt", body="User-agent: *\n",
             content_type="text/plain"),
        _row("http://slow.test/robots.txt",
             body="User-agent: *\nCrawl-delay: 10\n",
             content_type="text/plain"),
    ]
    for host in ("fast.test", "slow.test"):
        for i in range(n_pages):
            rows.append(_row(f"http://{host}/p{i}", body=f"page {i}",
                             content_type="text/plain"))
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_crawl_delay_shrinks_wave_budget(spark):
    pages = _delay_pages(spark).cache()
    pages.count()
    cfg = CrawlerConfig(initial_url="http://fast.test/p0",
                        filter_by_domain=False, respect_robots_txt=True,
                        tokens_per_host_per_wave=8, interval_ms=250)
    c = WaveCrawler(spark, pages, cfg, keep_content=False)
    seeds = [f"http://{h}/p{i}" for h in ("fast.test", "slow.test")
             for i in range(16)]
    c.seed(seeds)

    # wave 0: no robots parsed yet -> both hosts get the full budget; the
    # robots fetch happens inside the wave
    c.run_wave()
    # wave 1: slow.test's Crawl-delay: 10 vs wave duration 8*250ms = 2s
    # -> floor(2000/10000) = 0, floored to 1 token; fast.test unaffected
    assert c._crawl_delay_budgets() == {"slow.test": 1}
    c.run_wave()

    by_wave_host = {}
    for (wave, _id, url) in c.fetch_log:
        host = url.split("/")[2]
        by_wave_host[(wave, host)] = by_wave_host.get((wave, host), 0) + 1
    assert by_wave_host[(0, "fast.test")] == 8
    assert by_wave_host[(0, "slow.test")] == 8
    assert by_wave_host[(1, "fast.test")] == 8
    assert by_wave_host[(1, "slow.test")] == 1
    pages.unpersist()


def test_select_due_host_budgets_both_paths(spark):
    rows = [(h * 100 + i, f"http://{host}/x{i}", host, "queued")
            for h, host in enumerate(("a.test", "b.test"))
            for i in range(10)]
    df = spark.createDataFrame(
        rows, "id long, url string, host string, status string")
    for approx in (10_000, None):  # single-window path / two-phase path
        due = select_due(df, 5, approx_rows=approx,
                         host_budgets={"a.test": 2})
        got = {r["host"]: r["n"] for r in
               due.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert got == {"a.test": 2, "b.test": 5}, approx
        # FIFO: the budgeted picks are the smallest ids per host
        a_ids = sorted(r["id"] for r in
                       due.filter("host = 'a.test'").collect())
        assert a_ids == [0, 1]
