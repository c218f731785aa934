"""Bloom URL-seen side table properties + crawl equivalence.

Contract (SURVEY.md §7 item 4 / north_rule seen-structure): the Bloom
pre-filter may produce false positives (resolved by the exact anti-join)
but NEVER false negatives — so a bloom-enabled crawl must be result- and
order-identical to the exact-anti-join crawl."""

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.bloom import BloomSideTable
from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df
from simplecrawler_spark.store import SnapshotStore

BASE = "http://127.0.0.1:3000"


def _urls(spark, start, n, buckets=16):
    return (spark.range(start, start + n)
            .select(F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                             F.lit(".test/p/"), F.col("id").cast("string"))
                    .alias("url"),
                    (F.abs(F.xxhash64((F.col("id") % 7).cast("string")))
                     % buckets).cast("int").alias("host_bucket")))


def test_no_false_negatives_and_fpr_bound(spark, tmp_path):
    bt = BloomSideTable(str(tmp_path / "b"), spark,
                        capacity_per_bucket=2_000, target_fpr=0.01)
    added = _urls(spark, 0, 8_000)          # ~4x nominal per-bucket load
    bt.add(added)
    assert bt.probe(added).filter("NOT __maybe_seen").count() == 0
    fresh = _urls(spark, 1_000_000, 8_000)
    fp = bt.probe(fresh).filter("__maybe_seen").count()
    # overfilled on purpose: analytic fpr is tracked and must upper-bound the
    # empirical rate (within sampling noise)
    max_analytic = max(bt.fpr_by_bucket().values())
    assert fp / 8_000 <= max(3 * max_analytic, 0.02)


def test_merge_is_idempotent_and_monotone(spark, tmp_path):
    bt = BloomSideTable(str(tmp_path / "b"), spark,
                        capacity_per_bucket=5_000, target_fpr=0.01)
    a, b = _urls(spark, 0, 3_000), _urls(spark, 3_000, 3_000)
    bt.add(a)
    bt.add(b)
    bt.add(a)  # re-add: no effect on membership
    both = a.unionByName(b)
    assert bt.probe(both).filter("NOT __maybe_seen").count() == 0
    assert bt.version() == 2  # one generation per add


def test_bloom_crawl_identical_to_exact(spark, tmp_path):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    cfg = CrawlerConfig(initial_url=BASE + "/")
    ref = WaveCrawler(spark, pages, cfg)
    ref.run()

    bloomed = WaveCrawler(
        spark, pages, cfg,
        bloom=BloomSideTable(str(tmp_path / "bl"), spark,
                             capacity_per_bucket=1_000))
    bloomed.run()

    def snap(c):
        return [(r["id"], r["url"], r["status"], r["fetched"])
                for r in c.frontier.orderBy("id").collect()]
    assert snap(bloomed) == snap(ref)
    assert [u for (_, _, u) in bloomed.fetch_log] == \
           [u for (_, _, u) in ref.fetch_log]
    assert bloomed.events == ref.events
    pages.unpersist()


def test_store_lineage_carries_bloom_fpr(spark, tmp_path):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    cfg = CrawlerConfig(initial_url=BASE + "/depth/1", max_depth=2,
                        bloom_capacity_per_bucket=1_000)
    store = SnapshotStore(str(tmp_path / "s"), spark)
    c = WaveCrawler(spark, pages, cfg, store=store)
    assert c.bloom is not None  # auto-created under <store>/bloom
    c.run()
    lineage = store.lineage_rows()
    assert lineage
    assert all("bloom_fpr" in r for r in lineage)
    assert any(r["bloom_fpr"] is not None and r["bloom_fpr"] >= 0.0
               for r in lineage)

    # killed-and-resumed bloom run: filter generation survives via CURRENT
    resumed = WaveCrawler.resume(spark, pages, cfg,
                                 SnapshotStore(str(tmp_path / "s"), spark))
    assert resumed.bloom.version() >= 0
    assert resumed.bloom.probe(
        resumed.frontier.select("host_bucket", "url")) \
        .filter("NOT __maybe_seen").count() == 0
    pages.unpersist()


def test_delta_add_rewrites_only_touched_buckets(spark, tmp_path):
    # VERDICT r1 minor #6: an add must not rewrite every bucket blob
    bt = BloomSideTable(str(tmp_path / "b"), spark,
                        capacity_per_bucket=2_000, compact_after=50)
    bt.add(_urls(spark, 0, 2_000))               # v0: all buckets
    one_host = (spark.range(0, 100)
                .select(F.concat(F.lit("http://h1.test/q/"),
                                 F.col("id").cast("string")).alias("url"),
                        (F.abs(F.xxhash64(F.lit("1"))) % 16)
                        .cast("int").alias("host_bucket")))
    bt.add(one_host)                             # v1: exactly one bucket
    v1 = spark.read.parquet(str(tmp_path / "b" / "v1"))
    assert v1.count() == 1
    # untouched buckets still probe via the manifest (served from v0)
    full = _urls(spark, 0, 2_000)
    assert bt.probe(full).filter("NOT __maybe_seen").count() == 0
    assert bt.probe(one_host).filter("NOT __maybe_seen").count() == 0


def test_n_items_counts_distinct_keys(spark, tmp_path):
    bt = BloomSideTable(str(tmp_path / "b"), spark, capacity_per_bucket=2_000)
    dup = (spark.range(0, 500)
           .select(F.concat(F.lit("http://h1.test/p/"),
                            (F.col("id") % 50).cast("string")).alias("url"),
                   F.lit(3).cast("int").alias("host_bucket")))
    bt.add(dup)  # 500 rows, 50 distinct urls
    cur = bt.filters().collect()
    assert len(cur) == 1
    assert cur[0]["n_items"] == 50


def test_compaction_bounds_version_fanin(spark, tmp_path):
    bt = BloomSideTable(str(tmp_path / "b"), spark,
                        capacity_per_bucket=2_000, compact_after=3)
    for i in range(6):
        bt.add(_urls(spark, i * 500, 500))
    manifest = bt._manifest(bt.version())
    assert len(set(manifest.values())) <= 3 + 1
    assert bt.probe(_urls(spark, 0, 3_000)) \
             .filter("NOT __maybe_seen").count() == 0
