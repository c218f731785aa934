"""Checkpoint/resume goldens — the freeze/defrost contract
(reliability.integration.spec.ts:132-203): a killed crawl resumed from the
last committed snapshot continues with the SAME crawl ordering and lands on
the SAME final frontier as an uninterrupted run."""

import os
import shutil

import pytest

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df
from simplecrawler_spark.store import SnapshotStore

BASE = "http://127.0.0.1:3000"


@pytest.fixture(scope="module")
def pages(spark):
    df = fixture_pages_df(spark).coalesce(1).cache()
    df.count()
    yield df
    df.unpersist()


def snapshot(crawler):
    rows = crawler.frontier.orderBy("id").collect()
    return [(r["id"], r["url"], r["status"], r["fetched"], r["depth"])
            for r in rows]


def test_kill_and_resume_matches_uninterrupted(spark, pages, tmp_path):
    cfg = CrawlerConfig(initial_url=BASE + "/")
    # uninterrupted reference run (no store)
    ref = WaveCrawler(spark, pages, cfg)
    ref.run()
    ref_frontier = snapshot(ref)
    ref_log = [u for (_, _, u) in ref.fetch_log]

    # store-backed run, killed after 2 waves
    store_dir = str(tmp_path / "store")
    c1 = WaveCrawler(spark, pages, cfg, store=SnapshotStore(store_dir, spark))
    c1.seed()
    c1.run_wave()
    c1.run_wave()
    partial_log = [u for (_, _, u) in c1.fetch_log]
    del c1  # "kill"

    # leave an orphan delta dir (simulates crash between delta write and
    # manifest update) — resume must ignore it
    orphan = os.path.join(store_dir, "deltas", "seq=99")
    os.makedirs(orphan, exist_ok=True)

    resumed = WaveCrawler.resume(spark, pages, cfg,
                                 SnapshotStore(store_dir, spark))
    resumed.run()
    assert snapshot(resumed) == ref_frontier
    assert partial_log + [u for (_, _, u) in resumed.fetch_log] == ref_log
    # events survive the resume (cookieerror from /stage2 happened pre-kill)
    assert resumed.events.get("cookieerror", 0) == 1


def test_store_lineage_rows(spark, pages, tmp_path):
    cfg = CrawlerConfig(initial_url=BASE + "/depth/1", max_depth=2)
    store = SnapshotStore(str(tmp_path / "store2"), spark)
    c = WaveCrawler(spark, pages, cfg, store=store)
    c.run()
    lineage = store.lineage_rows()
    assert lineage, "lineage must be recorded per commit"
    assert {"wave", "host_bucket", "url_count"} <= set(lineage[0].keys())
    total = sum(r["url_count"] for r in lineage)
    assert total >= c.frontier.count()  # row versions >= final rows


def test_compaction_preserves_frontier(spark, pages, tmp_path, monkeypatch):
    # force the crawler's ratio-triggered compaction to fire on this tiny
    # crawl: every wave exceeds the (patched) uncompacted-row bound, so the
    # working copy re-bases and drives store.compact() repeatedly
    from simplecrawler_spark.plans import crawl as crawl_mod
    monkeypatch.setattr(crawl_mod, "COMPACT_MIN_ROWS", 0)
    monkeypatch.setattr(crawl_mod, "COMPACT_RATIO", 0.0)
    cfg = CrawlerConfig(initial_url=BASE + "/depth/1")
    store = SnapshotStore(str(tmp_path / "store3"), spark, compact_every=3)
    c = WaveCrawler(spark, pages, cfg, store=store)
    c.run()
    assert store.waves[-1].get("compacted"), "compaction must have run"
    final = snapshot(c)
    # manifest was compacted along the way; reread gives the same frontier
    reread = SnapshotStore(str(tmp_path / "store3"), spark)
    rows = reread.current_frontier().orderBy("id").collect()
    assert [(r["id"], r["url"], r["status"], r["fetched"], r["depth"])
            for r in rows] == final


def test_robots_side_log_keeps_manifest_constant(spark, pages, tmp_path):
    """Robots bodies + touched origins live in the append-only side log;
    the manifest JSON carries only counts — its robots section does not
    grow (or repeat bodies) across waves."""
    import json
    cfg = CrawlerConfig(initial_url=BASE + "/")
    store_dir = str(tmp_path / "store4")
    store = SnapshotStore(store_dir, spark)
    c = WaveCrawler(spark, pages, cfg, store=store)
    c.run()
    assert len(c.robots.files) >= 1
    manifest = open(os.path.join(store_dir, "manifest.json")).read()
    assert "Disallow" not in manifest          # bodies never inline
    log_path = os.path.join(store_dir, "robots_log.jsonl")
    log_lines = [json.loads(l) for l in open(log_path) if l.strip()]
    # each body written exactly once, ever
    assert sum(1 for e in log_lines if "robots" in e) == len(c.robots.files)
    assert sum(1 for e in log_lines if "touch" in e) == \
        len(c.robots.touched_hosts)
    assert any("Disallow" in e.get("robots", {}).get("body", "")
               for e in log_lines if "robots" in e)
    state = store.last_state()
    assert state["robots_log"] == {"touches": len(c.robots.touched_hosts),
                                   "files": len(c.robots.files)}

    # crash window: an orphan log suffix (append happened, manifest commit
    # didn't) is truncated on resume, so re-appends can't duplicate
    with open(log_path, "a") as f:
        f.write(json.dumps({"touch": "http://orphan.test"}) + "\n")
        f.write(json.dumps(
            {"robots": {"url": "http://orphan.test/robots.txt",
                        "body": "User-agent: *\nDisallow: /x\n"}}) + "\n")
    resumed = WaveCrawler.resume(spark, pages, cfg,
                                 SnapshotStore(store_dir, spark))
    assert len(resumed.robots.files) == state["robots_log"]["files"]
    assert resumed.robots.touched_hosts == c.robots.touched_hosts
    left = [json.loads(l) for l in open(log_path) if l.strip()]
    assert len(left) == state["robots_log"]["touches"] \
        + state["robots_log"]["files"]
