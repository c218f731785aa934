"""Batched robots pipeline (S3 at scale): one broadcast join per redirect
round instead of one driver job per host, origin-indexed RobotsStore.

Cross-host semantics under test (crawler.ts:1296-1335 + robots-parser):
- hosts WITH a robots.txt (even host ids in the synth corpus) reject their
  Disallow'd slice — never fetched;
- hosts WITHOUT one (odd ids) count robotstxterror and crawl unrestricted;
- the driver due-path and the distributed due-path produce identical
  frontiers and event counters.
"""

import re

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.ccpages import cc_to_crawl_pages, synth_cc_pages


def _crawl(spark, pages, seed_url, record_fetch_log):
    cfg = CrawlerConfig(initial_url=seed_url, filter_by_domain=False,
                        respect_robots_txt=True,
                        record_fetch_log=record_fetch_log,
                        id_mode="composite" if not record_fetch_log else "dense",
                        tokens_per_host_per_wave=32, max_waves=4)
    c = WaveCrawler(spark, pages, cfg, keep_content=False)
    c.seed()
    for _ in range(4):
        if c.queued_count == 0:
            break
        c.run_wave()
    return c


def test_robots_batch_cross_host(spark):
    cc = synth_cc_pages(spark, 300, 10, with_robots=True)
    pages = cc_to_crawl_pages(cc).cache()
    pages.count()
    seed_url = cc.filter("url like '%/p/%'").orderBy("url").first()["url"]

    a = _crawl(spark, pages, seed_url, record_fetch_log=True)
    b = _crawl(spark, pages, seed_url, record_fetch_log=False)

    # both due paths agree on the crawl outcome
    snap = lambda c: sorted((r["url"], r["status"], r["fetched"], r["depth"])
                            for r in c.frontier.collect())
    assert snap(a) == snap(b)
    for key in ("robotstxterror", "fetchdisallowed", "queueadd", "downloaded"):
        assert a.events.get(key, 0) == b.events.get(key, 0), key

    # robots were actually consulted: some hosts lack robots.txt (odd ids)
    assert a.events.get("robotstxterror", 0) >= 1
    # even host k Disallows /p/<k%10> — no fetched URL may violate it
    fetched = [r["url"] for r in a.frontier.filter(
        "fetched AND status IN ('downloaded','headers')").collect()]
    for url in fetched:
        m = re.match(r"http://h(\d+)\.test(/p/\d+)$", url)
        if m and int(m.group(1)) % 2 == 0:
            assert not m.group(2).startswith(f"/p/{int(m.group(1)) % 10}"), url
    # and the disallow path fired somewhere (candidate reject or due split)
    assert (a.events.get("fetchdisallowed", 0) > 0
            or a.frontier.filter("status = 'disallowed'").count() > 0)
    # origin index grew one entry per robots file, no duplicate origins
    assert len(a.robots._by_origin) == len(a.robots.files)

    # scale path (no fetch log, no conditions): robots verdicts come from
    # the distributed robots_rules side table — the driver retains NO
    # parsed robots objects and never builds the O(hosts) broadcast; one
    # side-table row per origin whose robots.txt has applicable rules
    # (every even host here), counted against the total parsed files
    assert b._robots_side_active
    assert b._robots_bc is None
    assert b.robots.files == []          # nothing retained driver-side
    assert b._robots_file_count == len(a.robots.files)
    side = b._robots_side_view()
    assert side is not None
    side_rows = side.collect()
    assert len(side_rows) == b._robots_file_count  # all fixtures have rules
    assert len({(r["protocol"], r["host"], r["port"])
                for r in side_rows}) == len(side_rows)
    # driver/golden path keeps the broadcast-capable retained store
    assert a.robots.files and a._robots_file_count == len(a.robots.files)

    # distributed due path: origins already triggered are anti-joined out,
    # so the per-wave trigger collect is O(new origins)
    assert b._touched_view() is not None
    touched_rows = {(r["protocol"], r["host"], r["port"])
                    for r in b._touched_view().collect()}
    assert touched_rows == b._touched_trig_set
    pages.unpersist()
