"""Bulk distributed seeding (the 10^8-seed path)."""

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.ccpages import cc_to_crawl_pages, synth_cc_pages
from simplecrawler_spark.store import SnapshotStore


def _crawler(spark, pages, store=None):
    cfg = CrawlerConfig(initial_url="http://h0.test/p/0",
                        filter_by_domain=False, respect_robots_txt=False,
                        record_fetch_log=False, id_mode="composite",
                        tokens_per_host_per_wave=64)
    return WaveCrawler(spark, pages, cfg, store=store, keep_content=False)


def test_seed_frontier_storeless(spark):
    cc = synth_cc_pages(spark, 200, 8)
    pages = cc_to_crawl_pages(cc).cache()
    pages.count()
    c = _crawler(spark, pages)
    c.seed()
    n = c.seed_frontier(cc.filter("url like '%/p/1%'").select("url"))
    assert n == c.frontier.filter("status = 'queued'").count() - 1  # + seed()
    assert c.queued_count == n + 1
    # urls parsed correctly JVM-side
    row = c.frontier.filter("referrer = '' AND NOT is_seed_chain").first()
    assert row["protocol"] == "http" and row["host"].startswith("h")
    assert row["path"].startswith("/p/")
    # dedupe: re-seeding the same urls adds nothing
    assert c.seed_frontier(cc.filter("url like '%/p/1%'").select("url")) == 0
    c.run_wave()
    assert c.frontier.filter("fetched").count() > 0
    pages.unpersist()


def test_seed_frontier_with_store_and_ids(spark, tmp_path):
    cc = synth_cc_pages(spark, 100, 4)
    pages = cc_to_crawl_pages(cc).cache()
    pages.count()
    store = SnapshotStore(str(tmp_path / "s"), spark)
    c = _crawler(spark, pages, store=store)
    c.seed()
    seeds = (cc.withColumn("id", F.regexp_extract("url", r"/p/(\d+)$", 1)
                           .cast("long"))
             .filter("id % 10 = 0 AND id > 0").select("id", "url"))
    n = c.seed_frontier(seeds)
    assert n == seeds.count()
    assert c.next_id > 90  # advanced past the max provided id
    # manifest carries post-seed counters → resume sees them
    resumed = WaveCrawler.resume(spark, pages, c.config,
                                 SnapshotStore(str(tmp_path / "s"), spark))
    assert resumed.queued_count == c.queued_count
    assert resumed.next_id == c.next_id
    pages.unpersist()


def test_raw_prefilter_frontier_identical(spark):
    from simplecrawler_spark.config import CrawlerConfig as CC
    cc = synth_cc_pages(spark, 300, 10)
    pages = cc_to_crawl_pages(cc).cache()
    pages.count()
    # seed with a URL that actually exists in the corpus so the crawl
    # discovers links for several waves (http://h0.test/p/0 may 404:
    # host_of(0) need not be 0)
    seed_url = cc.orderBy("url").first()["url"]

    def run(prefilter):
        cfg = CC(initial_url=seed_url, filter_by_domain=False,
                 respect_robots_txt=False, record_fetch_log=False,
                 id_mode="composite", tokens_per_host_per_wave=64,
                 max_waves=4, raw_url_prefilter=prefilter)
        crawler = WaveCrawler(spark, pages, cfg, keep_content=False)
        crawler.seed()
        for _ in range(4):
            if crawler.queued_count == 0:
                break
            crawler.run_wave()
        return crawler

    a, b = run(False), run(True)
    snap = lambda c: sorted(
        (r["id"], r["url"], r["status"], r["fetched"], r["depth"])
        for r in c.frontier.collect())
    assert snap(a) == snap(b)
    assert a.events.get("queueadd") == b.events.get("queueadd")
    # total attempts conserved: duplicates may be reclassified, not lost
    total = lambda c: sum(c.events.get(k, 0) for k in
                          ("queueadd", "queueduplicate", "junkurl"))
    assert total(a) == total(b)
    # the prefilter must actually be LIVE: the raw-seen set is populated and
    # later waves push strictly fewer rows through the python canonicalizer
    assert b._raw_seen_view() is not None and b._raw_seen_view().count() > 0
    assert a._raw_seen_view() is None
    # incremental maintenance: one O(wave) distinct-delta part per
    # candidate-producing wave, NO per-wave rewrite of the accumulated set
    # (base stays empty until the LSM ratio/width trigger — far above this
    # corpus), and the upper-bound accounting never launched a count job
    assert b._raw_seen_base is None
    assert 1 <= len(b._raw_seen_parts) <= len(b.metrics)
    assert b._raw_seen_part_rows == sum(
        m.get("python_candidates", 0) for m in b.metrics)
    pc = lambda c: [m.get("python_candidates", 0) for m in c.metrics]
    assert len(pc(a)) == len(pc(b)) and len(pc(b)) >= 3
    assert sum(pc(b)[1:]) < sum(pc(a)[1:]), (pc(a), pc(b))
    assert all(x <= y for x, y in zip(pc(b), pc(a)))
    pages.unpersist()
