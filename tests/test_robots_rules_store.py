"""Store-backed ``robots_rules`` side table: resume reads committed parquet
parts instead of re-parsing every robots body driver-side (the last O(hosts)
driver cost at restart — reference analog: the robots store entries the
freeze/defrost contract re-serializes, /root/reference/src/queue.ts:268-313,
src/crawler.ts:603).

Asserts, in side-table mode (distributed due path):
- the committed parquet parts carry one row per origin with applicable
  rules and/or a Crawl-delay;
- resume performs ZERO driver-side ``parse_robots`` calls (counter), and
  the wave loop itself performs none either (parsing moved into the robots
  fetch Arrow kernel — executors run in separate worker processes, so the
  driver counter stays untouched);
- a resumed crawl lands on the same frontier, events and Crawl-delay
  budgets as an uninterrupted run.
"""

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.ccpages import cc_to_crawl_pages, synth_cc_pages
from simplecrawler_spark.store import SnapshotStore


@pytest.fixture(scope="module")
def pages(spark):
    cc = synth_cc_pages(spark, 600, 24, with_robots=True)
    # give host h2 a Crawl-delay so the budget cache has content to resume;
    # keep its Disallow rule (even host)
    delay_body = "User-agent: *\nCrawl-delay: 30\nDisallow: /p/2\n"
    patched = cc.withColumn(
        "text",
        F.when(F.col("url") == "http://h2.test/robots.txt",
               F.lit(delay_body)).otherwise(F.col("text")))
    patched = patched.withColumn(
        "html",
        F.when(F.col("url") == "http://h2.test/robots.txt",
               F.encode(F.lit(delay_body), "UTF-8")).otherwise(F.col("html")))
    df = cc_to_crawl_pages(patched).cache()
    df.count()
    yield df
    df.unpersist()


def _cfg(seed_url):
    return CrawlerConfig(
        initial_url=seed_url, filter_by_domain=False,
        respect_robots_txt=True, record_fetch_log=False,
        tokens_per_host_per_wave=64, host_buckets=8)


def _seeds(spark, pages):
    return [r["url"] for r in
            pages.filter(~F.col("url").endswith("/robots.txt"))
            .orderBy("url").limit(30).collect()]


def _snapshot(c):
    rows = c.frontier.orderBy("id").collect()
    return [(r["id"], r["url"], r["status"]) for r in rows]


def _parse_calls():
    from simplecrawler_spark.functions import robots as R
    return R.PARSE_CALLS


def test_store_backed_rules_resume_no_driver_parse(spark, pages, tmp_path):
    seeds = _seeds(spark, pages)

    # uninterrupted reference
    ref = WaveCrawler(spark, pages, _cfg(seeds[0]),
                      store=SnapshotStore(str(tmp_path / "ref"), spark),
                      keep_content=False)
    ref.seed(seeds)
    ref.run(max_waves=3)
    ref_frontier = _snapshot(ref)
    ref_events = dict(ref.events)
    ref_budgets = dict(ref._delay_budgets_cache[0])
    assert ref_budgets, "Crawl-delay host must populate the budget cache"

    # side-table mode distributes the parse into the fetch kernel: the
    # DRIVER must not have parsed anything during the reference run either
    p0 = _parse_calls()

    # killed run: 1 wave, then resume from the committed snapshot
    store_dir = str(tmp_path / "store")
    c1 = WaveCrawler(spark, pages, _cfg(seeds[0]),
                     store=SnapshotStore(store_dir, spark),
                     keep_content=False)
    c1.seed(seeds)
    c1.run_wave()
    c1.run_wave()
    n_parts = c1._robots_rules_parts_flushed
    assert n_parts >= 1, "wave commit must flush a robots_rules parquet part"
    budgets_at_kill = dict(c1._delay_budgets_cache[0])
    del c1

    store = SnapshotStore(store_dir, spark)
    rules = store.read_robots_rules(n_parts)
    got_hosts = {r["host"] for r in rules.collect()}
    # even hosts serve a robots.txt with a Disallow rule → a rules row
    assert got_hosts and all(int(h[1:].split(".")[0]) % 2 == 0
                             for h in got_hosts)

    before = _parse_calls()
    resumed = WaveCrawler.resume(spark, pages, _cfg(seeds[0]), store)
    assert _parse_calls() == before, \
        "parquet resume must not parse any robots body driver-side"
    # exactly the budgets known at the kill point are restored from parquet
    assert dict(resumed._delay_budgets_cache[0]) == budgets_at_kill
    resumed.run(max_waves=3)
    assert _parse_calls() == p0 == before, \
        "side-table wave loop must never parse driver-side"
    assert dict(resumed._delay_budgets_cache[0]) == ref_budgets
    assert _snapshot(resumed) == ref_frontier
    assert dict(resumed.events) == ref_events


def test_orphan_rules_part_pruned(spark, pages, tmp_path):
    seeds = _seeds(spark, pages)
    store_dir = str(tmp_path / "store")
    c1 = WaveCrawler(spark, pages, _cfg(seeds[0]),
                     store=SnapshotStore(store_dir, spark),
                     keep_content=False)
    c1.seed(seeds)
    c1.run_wave()
    n_parts = c1._robots_rules_parts_flushed
    frontier_after_2 = None
    c1.run_wave()
    frontier_after_2 = _snapshot(c1)
    del c1

    # simulate a crash between the rules-part write and the manifest commit:
    # resume from the wave-1 manifest with an orphan part on disk
    import json as _json
    import os
    store = SnapshotStore(store_dir, spark)
    # roll the manifest back one wave (keep only the first 2 commits:
    # seed + wave 1)
    store._manifest["waves"] = store._manifest["waves"][:2]
    store._write_manifest()
    store = SnapshotStore(store_dir, spark)
    state = store.last_state()
    assert state["robots_rules_parts"] <= n_parts
    orphan_dir = os.path.join(store_dir, "robots_rules", "part=7")
    os.makedirs(orphan_dir, exist_ok=True)

    resumed = WaveCrawler.resume(spark, pages, _cfg(seeds[0]), store)
    assert not os.path.exists(orphan_dir), "orphan part must be pruned"
    resumed.run_wave()
    assert _snapshot(resumed) == frontier_after_2


def test_side_view_folds_to_store_parquet(spark, pages, tmp_path):
    """After a flush lands robots rows in the store, the working
    robots_rules view must adopt the store's parquet as its base (a
    stats-bearing scan — the layout of the >broadcast regime), with
    verdict rows unchanged."""
    seeds = _seeds(spark, pages)
    c = WaveCrawler(spark, pages, _cfg(seeds[0]),
                    store=SnapshotStore(str(tmp_path / "s"), spark),
                    keep_content=False)
    c.seed(seeds)
    c.run_wave()
    c.run_wave()
    side = c._robots_side_view()
    assert side is not None
    # base adopted from parquet: scan nodes, not an RDD checkpoint
    assert c._robots_side_base is not None and not c._robots_side_parts
    plan = c._robots_side_base._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Scan parquet" in plan or "FileScan" in plan, plan[:300]
    # row parity with the durable parts
    want = sorted((r["host"], r["rules_json"]) for r in
                  SnapshotStore(str(tmp_path / "s"), spark)
                  .read_robots_rules(c._robots_rules_parts_flushed)
                  .collect())
    got = sorted((r["host"], r["rules_json"]) for r in side.collect())
    assert got == want


def test_retain_mode_resume_preserves_committed_rules(spark, pages, tmp_path):
    """ADVICE r04 (high): with the DEFAULT config (record_fetch_log=True ⇒
    driver retains parsed files ⇒ replay resume branch), the committed
    robots_rules part counter must be restored on resume. Before the fix,
    the first post-resume flush treated part=0 as a crash orphan and
    rmtree'd it, and the store-backed fold then swapped the verdict base to
    a parts-only scan — every pre-resume Disallow rule vanished and
    disallowed URLs got crawled."""

    def cfg(seed_url):
        return CrawlerConfig(
            initial_url=seed_url, filter_by_domain=False,
            respect_robots_txt=True, record_fetch_log=True,
            tokens_per_host_per_wave=64, host_buckets=8)

    seeds = _seeds(spark, pages)
    all_hosts = sorted({r["host"] for r in
                        pages.selectExpr(
                            "parse_url(url, 'HOST') AS host").distinct()
                        .collect()})

    def fresh_even_origin(crawler):
        touched = set(crawler.robots.touched_hosts)
        for h in all_hosts:
            if int(h[1:].split(".")[0]) % 2 == 0 \
                    and f"http://{h}" not in touched:
                return f"http://{h}"
        return None

    # uninterrupted reference doing the same seed-mid-crawl sequence
    ref = WaveCrawler(spark, pages, cfg(seeds[0]),
                      store=SnapshotStore(str(tmp_path / "ref"), spark),
                      keep_content=False)
    ref.seed(seeds)
    ref.run(max_waves=2)
    extra = fresh_even_origin(ref)
    assert extra is not None, "need an untouched even host for the new flush"
    ref.seed([extra + "/p/0", extra + f"/p/{int(extra[8:].split('.')[0])%10}"])
    ref.run(max_waves=4)
    ref_frontier = _snapshot(ref)
    ref_events = dict(ref.events)

    # killed run, same sequence, resume between wave 2 and the extra seed
    store_dir = str(tmp_path / "store")
    c1 = WaveCrawler(spark, pages, cfg(seeds[0]),
                     store=SnapshotStore(store_dir, spark),
                     keep_content=False)
    c1.seed(seeds)
    c1.run(max_waves=2)
    n_parts = c1._robots_rules_parts_flushed
    assert n_parts >= 1, "kill point must have committed robots_rules parts"
    pre_hosts = {r["host"]
                 for r in SnapshotStore(store_dir, spark)
                 .read_robots_rules(n_parts).collect()}
    assert pre_hosts
    del c1

    store = SnapshotStore(store_dir, spark)
    resumed = WaveCrawler.resume(spark, pages, cfg(seeds[0]), store)
    assert resumed._robots_rules_parts_flushed == n_parts, \
        "replay resume must restore the committed part counter"
    resumed.seed([extra + "/p/0",
                  extra + f"/p/{int(extra[8:].split('.')[0])%10}"])
    resumed.run(max_waves=4)

    # the committed parquet still carries every pre-resume rules row, plus
    # the post-resume origin's — nothing was rmtree'd or folded away
    post_hosts = {r["host"] for r in store.read_robots_rules(
        resumed._robots_rules_parts_flushed).collect()}
    assert pre_hosts <= post_hosts
    assert extra.split("//")[1] in post_hosts

    # pre-resume disallow verdicts survive: identical frontier (incl.
    # 'disallowed' statuses) and events as the uninterrupted run
    got = _snapshot(resumed)
    assert got == ref_frontier
    assert dict(resumed.events) == ref_events
    assert any(s == "disallowed" for (_, _, s) in got)
