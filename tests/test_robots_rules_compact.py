"""robots_rules part-dir compaction (VERDICT r04 #3): a long crawl adds one
``part=N`` parquet dir per new-origin flush; once the count passes
``ROBOTS_RULES_COMPACT_MAX_PARTS`` the flush folds base + parts + pending
rows into ONE new ``base=G`` generation, so the working base's scan fan-in
stays bounded over any number of flushes (the Iceberg rewrite_data_files
analog for the rules side table).

Crash-window contract mirrored from the frontier store: a compaction's new
base dir is an orphan until a manifest carrying its generation lands;
superseded dirs are pruned only at the NEXT flush (strictly after that
manifest); resume deletes any dir the committed manifest does not
reference — bases at other generations, parts beyond the prefix."""

import os

import pytest

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import (ROBOTS_RULES_COMPACT_MAX_PARTS,
                                             WaveCrawler)
from simplecrawler_spark.sources.ccpages import cc_to_crawl_pages, synth_cc_pages
from simplecrawler_spark.store import SnapshotStore


def _rules_dirs(store_dir):
    root = os.path.join(store_dir, "s", "robots_rules")
    return sorted(os.listdir(root)) if os.path.isdir(root) else []


def _mk_crawler(spark, pages, store_dir):
    cfg = CrawlerConfig(
        initial_url="http://h0.test/p/0", filter_by_domain=False,
        respect_robots_txt=True, record_fetch_log=False,
        tokens_per_host_per_wave=64, host_buckets=4)
    return WaveCrawler(spark, pages, cfg,
                       store=SnapshotStore(os.path.join(store_dir, "s"), spark),
                       keep_content=False)


@pytest.fixture(scope="module")
def pages(spark):
    df = cc_to_crawl_pages(synth_cc_pages(spark, 120, 6,
                                          with_robots=True)).cache()
    df.count()
    yield df
    df.unpersist()


def _row(i):
    # one synthetic origin per flush, distinct hosts
    return ("http", f"x{i}.test", 80,
            '[{"pattern": "/p/1", "allow": false}]', None, i)


def test_fan_in_bounded_after_100_flushes(spark, pages, tmp_path):
    c = _mk_crawler(spark, pages, str(tmp_path))
    c.seed(["http://h0.test/p/0"])  # commits wave 0 so manifests exist
    n_flushes = 100
    for i in range(n_flushes):
        c._robots_rules_unflushed = [_row(i)]
        # manifest commit after each flush, exactly as commit_wave does
        c.store.commit_wave(c.wave, c.spark.createDataFrame(
            [], c.frontier.schema), c._driver_state(), auto_compact=False)
    dirs = _rules_dirs(str(tmp_path))
    # bounded: at most one base + MAX parts + one not-yet-pruned old base
    assert len(dirs) <= ROBOTS_RULES_COMPACT_MAX_PARTS + 2, dirs
    assert any(d.startswith("base=") for d in dirs)
    # every flushed row survives the folds
    got = c.store.read_robots_rules(c._robots_rules_parts_flushed,
                                    c._robots_rules_base_gen, prune=False)
    hosts = {r["host"] for r in got.collect()}
    assert {f"x{i}.test" for i in range(n_flushes)} <= hosts
    # seq order (the first-delay-wins tie-break) survives the folds
    seqs = sorted(r["seq"] for r in got.collect() if r["host"].startswith("x"))
    assert seqs == list(range(n_flushes))


def test_resume_after_compaction_and_orphan_pruning(spark, pages, tmp_path):
    c = _mk_crawler(spark, pages, str(tmp_path))
    c.seed(["http://h0.test/p/0"])
    n_flushes = ROBOTS_RULES_COMPACT_MAX_PARTS + 3  # forces >=1 compaction
    for i in range(n_flushes):
        c._robots_rules_unflushed = [_row(i)]
        c.store.commit_wave(c.wave, c.spark.createDataFrame(
            [], c.frontier.schema), c._driver_state(), auto_compact=False)
    gen, parts = c._robots_rules_base_gen, c._robots_rules_parts_flushed
    assert gen >= 1
    store_path = os.path.join(str(tmp_path), "s")
    del c

    # crash artifacts: an orphan base from a "crashed compaction" and an
    # orphan part beyond the committed prefix
    root = os.path.join(store_path, "robots_rules")
    os.makedirs(os.path.join(root, f"base={gen + 7}"))
    os.makedirs(os.path.join(root, f"part={parts + 5}"))

    store = SnapshotStore(store_path, spark)
    resumed = WaveCrawler.resume(
        spark, pages,
        CrawlerConfig(initial_url="http://h0.test/p/0",
                      filter_by_domain=False, respect_robots_txt=True,
                      record_fetch_log=False, tokens_per_host_per_wave=64,
                      host_buckets=4),
        store)
    assert resumed._robots_rules_base_gen == gen
    assert resumed._robots_rules_parts_flushed == parts
    dirs = _rules_dirs(str(tmp_path))
    assert f"base={gen + 7}" not in dirs
    assert f"part={parts + 5}" not in dirs
    got = store.read_robots_rules(parts, gen, prune=False)
    hosts = {r["host"] for r in got.collect()}
    assert {f"x{i}.test" for i in range(n_flushes)} <= hosts
