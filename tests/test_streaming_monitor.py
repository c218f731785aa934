"""Structured-Streaming monitor over the snapshot store's delta log."""

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df
from simplecrawler_spark.store import SnapshotStore
from simplecrawler_spark.streaming.monitor import (frontier_updates,
                                                   run_catchup, wave_rates)

BASE = "http://127.0.0.1:3000"


def test_monitor_catchup_counts(spark, tmp_path):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    store = SnapshotStore(str(tmp_path / "store"), spark)
    c = WaveCrawler(spark, pages, CrawlerConfig(initial_url=BASE + "/"),
                    store=store)
    c.run()

    snap = run_catchup(spark, str(tmp_path / "store"),
                       str(tmp_path / "ckpt"), table_name="t_mon")
    rows = snap.collect()
    assert rows, "stream saw the committed deltas"
    by_status = {}
    for r in rows:
        assert r["host_bucket"] is not None  # recovered from the dir name
        by_status[r["status"]] = by_status.get(r["status"], 0) + r["n"]
    # terminal statuses visible; counts >= final frontier's (row versions)
    final = {r["status"]: r["n"] for r in
             c.frontier.groupBy("status").agg(F.count("*").alias("n"))
             .collect()}
    for status, n in final.items():
        assert by_status.get(status, 0) >= n

    # wave_rates over the same log: one batch view (batch read of the glob)
    batch = (spark.read.schema(c.frontier.schema)
             .option("pathGlobFilter", "*.parquet")
             .parquet(str(tmp_path / "store" / "deltas" / "*" / "*")))
    rates = {r["wave"]: r for r in wave_rates(batch).collect()}
    assert rates[0]["enqueued"] >= 1          # the seed
    assert sum(r["fetched"] for r in rates.values()) >= 8
    pages.unpersist()
