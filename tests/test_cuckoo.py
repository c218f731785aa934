"""Cuckoo-filter URL-seen side table: kernel properties, persistence,
deletion, and crawl equivalence.

Contract (north_rule "Bloom/cuckoo" seen-structure, same as bloom.py): the
pre-filter may produce false positives (resolved by the exact anti-join)
but NEVER false negatives — even under deliberate overfill, where evicted
fingerprints land in the bounded stash. Unlike the Bloom, `remove()` must
clear membership for previously-added keys without disturbing others."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.cuckoo import (CuckooSideTable, SLOT_W, _contains,
                                        _indices, _insert_batch, _n_slots_for)
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


# ---------------------------------------------------------------- kernel
def _keys(n, n_slots, seed=0):
    rng = np.random.RandomState(seed)
    h1 = pd.Series(rng.randint(-2**62, 2**62, size=n, dtype=np.int64))
    h2 = pd.Series(rng.randint(-2**62, 2**62, size=n, dtype=np.int64))
    return _indices(h1, h2, n_slots)


def test_kernel_insert_then_contains_all():
    n_slots = 256
    table = np.zeros((n_slots, SLOT_W), dtype=np.uint16)
    stash = []
    fp, i1, i2 = _keys(700, n_slots)          # ~68% load
    _insert_batch(table, stash, fp, i1, i2, n_slots)
    assert _contains(table, stash, fp, i1, i2).all()
    # every key occupies exactly one slot (or one stash entry)
    assert int((table != 0).sum()) + len(stash) == len(fp)


def test_kernel_no_false_negatives_under_overfill():
    # 2x the table's absolute capacity: eviction walks WILL fail; the stash
    # must absorb the overflow so membership never lies
    n_slots = 64
    table = np.zeros((n_slots, SLOT_W), dtype=np.uint16)
    stash = []
    fp, i1, i2 = _keys(2 * n_slots * SLOT_W, n_slots, seed=1)
    _insert_batch(table, stash, fp, i1, i2, n_slots)
    assert len(stash) > 0                      # overflow actually happened
    assert _contains(table, stash, fp, i1, i2).all()


def test_kernel_partner_index_is_symmetric():
    # i2 = i1 ^ H(fp) must be an involution: alt(alt(i)) == i — the
    # eviction walk depends on it to bounce between exactly two homes
    from simplecrawler_spark.cuckoo import _alt_index
    n_slots = 1024
    fp, i1, i2 = _keys(1000, n_slots, seed=2)
    back = _alt_index(i2, fp, n_slots)
    assert (back == i1).all()


def test_n_slots_sizing_power_of_two():
    for cap in (10, 100, 1_000, 100_000):
        s = _n_slots_for(cap)
        assert s & (s - 1) == 0
        assert s * SLOT_W >= cap               # fits below 100% load


# ------------------------------------------------------------ side table
def test_no_false_negatives_and_low_fpr(spark, tmp_path):
    ct = CuckooSideTable(str(tmp_path / "c"), spark,
                         capacity_per_bucket=2_000)
    added = _urls(spark, 0, 8_000)
    ct.add(added)
    assert ct.probe(added).filter("NOT __maybe_seen").count() == 0
    fresh = _urls(spark, 1_000_000, 8_000)
    fp = ct.probe(fresh).filter("__maybe_seen").count()
    # 16-bit fingerprints: empirical FPR should sit far below the Bloom's 1%
    assert fp / 8_000 <= 0.005


def test_add_is_idempotent_and_counts_distinct(spark, tmp_path):
    ct = CuckooSideTable(str(tmp_path / "c"), spark,
                         capacity_per_bucket=5_000)
    a = _urls(spark, 0, 3_000)
    ct.add(a)
    n1 = {r["host_bucket"]: r["n_items"] for r in ct.filters().collect()}
    ct.add(a)                                  # re-add: zero new items
    n2 = {r["host_bucket"]: r["n_items"] for r in ct.filters().collect()}
    assert n1 == n2
    assert ct.probe(a).filter("NOT __maybe_seen").count() == 0
    assert ct.version() == 1                   # one generation per add


def test_remove_clears_membership_without_collateral(spark, tmp_path):
    ct = CuckooSideTable(str(tmp_path / "c"), spark,
                         capacity_per_bucket=2_000)
    keep = _urls(spark, 0, 2_000)
    gone = _urls(spark, 2_000, 2_000)
    ct.add(keep.unionByName(gone))
    ct.remove(gone)
    # removed keys read fresh (up to the tiny fingerprint-collision fpr)
    still = ct.probe(gone).filter("__maybe_seen").count()
    assert still / 2_000 <= 0.005
    # kept keys are untouched: strict no-false-negatives
    assert ct.probe(keep).filter("NOT __maybe_seen").count() == 0
    # n_items went down
    assert sum(r["n_items"] for r in ct.filters().collect()) <= 2_000 + 10


def test_remove_of_never_added_is_harmless(spark, tmp_path):
    ct = CuckooSideTable(str(tmp_path / "c"), spark,
                         capacity_per_bucket=2_000)
    keep = _urls(spark, 0, 2_000)
    ct.add(keep)
    ct.remove(_urls(spark, 5_000_000, 2_000))  # absent keys: no-op
    assert ct.probe(keep).filter("NOT __maybe_seen").count() == 0


def test_delta_add_rewrites_only_touched_buckets(spark, tmp_path):
    ct = CuckooSideTable(str(tmp_path / "c"), spark,
                         capacity_per_bucket=2_000, compact_after=50)
    ct.add(_urls(spark, 0, 2_000))               # v0: all buckets
    one_host = (spark.range(0, 100)
                .select(F.concat(F.lit("http://h1.test/q/"),
                                 F.col("id").cast("string")).alias("url"),
                        (F.abs(F.xxhash64(F.lit("1"))) % 16)
                        .cast("int").alias("host_bucket")))
    ct.add(one_host)                             # v1: exactly one bucket
    v1 = spark.read.parquet(str(tmp_path / "c" / "v1"))
    assert v1.count() == 1
    # untouched buckets still probe via the manifest (served from v0)
    assert ct.probe(_urls(spark, 0, 2_000)) \
             .filter("NOT __maybe_seen").count() == 0


def test_blob_deterministic_under_input_order(spark, tmp_path):
    # cuckoo state is insertion-order-sensitive; the merge sorts keys, so
    # the committed blob must not depend on DataFrame partitioning/order
    a = CuckooSideTable(str(tmp_path / "a"), spark, capacity_per_bucket=500)
    b = CuckooSideTable(str(tmp_path / "b"), spark, capacity_per_bucket=500)
    urls = _urls(spark, 0, 1_000)
    a.add(urls.repartition(7))
    b.add(urls.orderBy(F.desc("url")).coalesce(1))
    rows_a = {r["host_bucket"]: (bytes(r["table"]), bytes(r["stash"]))
              for r in a.filters().collect()}
    rows_b = {r["host_bucket"]: (bytes(r["table"]), bytes(r["stash"]))
              for r in b.filters().collect()}
    assert rows_a == rows_b


def test_cuckoo_crawl_identical_to_exact(spark, tmp_path):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    cfg = CrawlerConfig(initial_url=BASE + "/")
    ref = WaveCrawler(spark, pages, cfg)
    ref.run()

    cuckooed = WaveCrawler(
        spark, pages, cfg,
        bloom=CuckooSideTable(str(tmp_path / "ck"), spark,
                              capacity_per_bucket=1_000))
    cuckooed.run()

    def snap(c):
        return [(r["id"], r["url"], r["status"], r["fetched"])
                for r in c.frontier.orderBy("id").collect()]
    assert snap(cuckooed) == snap(ref)
    assert [u for (_, _, u) in cuckooed.fetch_log] == \
           [u for (_, _, u) in ref.fetch_log]
    assert cuckooed.events == ref.events
    pages.unpersist()


def test_store_autocreates_cuckoo_and_resumes(spark, tmp_path):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    cfg = CrawlerConfig(initial_url=BASE + "/depth/1", max_depth=2,
                        bloom_capacity_per_bucket=1_000,
                        seen_filter="cuckoo")
    store = SnapshotStore(str(tmp_path / "s"), spark)
    c = WaveCrawler(spark, pages, cfg, store=store)
    assert isinstance(c.bloom, CuckooSideTable)  # knob routed
    c.run()
    lineage = store.lineage_rows()
    assert lineage and all("bloom_fpr" in r for r in lineage)

    resumed = WaveCrawler.resume(spark, pages, cfg,
                                 SnapshotStore(str(tmp_path / "s"), spark))
    assert resumed.bloom.version() >= 0
    assert resumed.bloom.probe(
        resumed.frontier.select("host_bucket", "url")) \
        .filter("NOT __maybe_seen").count() == 0
    pages.unpersist()
