"""End-to-end wave-crawl goldens replayed against the fixture pages table.

Golden values derive from the reference's integration specs:
- 8 fetch-starts / final statuses: reliability.integration.spec.ts:222-246,
  testcrawl.integration.spec.ts:96-131,196-210
- depth counts: depth.integration.spec.ts:25-30
- nofollow: discovery.unit.spec.ts:182-189 + routes /nofollow
- redirect + initial-domain-change matrix: testcrawl.integration.spec.ts:286-357
- cross-port robots: testcrawl.integration.spec.ts:149-175
- decode/compress goldens: resourcevalidity.integration.spec.ts:269-342

All crawls for this module run concurrently on the shared local session
(Spark's scheduler is thread-safe); tests then assert on the finished
crawlers. This keeps wall time bounded by the slowest crawl, not the sum.
"""

import gzip
from concurrent.futures import ThreadPoolExecutor

import pytest

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df

BASE = "http://127.0.0.1:3000"

CRAWL_SPECS = {
    "main": (BASE + "/", {}),
    "no_robots": (BASE + "/", {"respect_robots_txt": False}),
    "depth0": (BASE + "/depth/1", {"max_depth": 0}),
    "depth1": (BASE + "/depth/1", {"max_depth": 1}),
    "depth2": (BASE + "/depth/1", {"max_depth": 2}),
    "depth3": (BASE + "/depth/1", {"max_depth": 3}),
    "redir_allow": (BASE + "/domain-redirect",
                    {"allow_initial_domain_change": True}),
    "redir_deny": (BASE + "/domain-redirect", {}),
    "redir_later": (BASE + "/to-domain-redirect",
                    {"allow_initial_domain_change": True}),
    "cross_port": (BASE + "/to/other/port", {"filter_by_domain": False}),
    "timeout": (BASE + "/timeout", {}),
    "gz_link": (BASE + "/compressed/link", {}),
    "gz_body": (BASE + "/compressed/gzip", {}),
    "deflate": (BASE + "/compressed/deflate", {}),
    "gz_raw": (BASE + "/compressed/gzip", {"decompress_responses": False}),
    "enc_header": (BASE + "/encoded/header", {"decode_responses": True}),
    "enc_inline": (BASE + "/encoded/inline", {"decode_responses": True}),
    "enc_old": (BASE + "/encoded/old-inline", {"decode_responses": True}),
    "enc_empty": (BASE + "/encoded/empty", {"decode_responses": True}),
}


@pytest.fixture(scope="module")
def crawls(spark):
    pages = fixture_pages_df(spark).coalesce(1).cache()
    pages.count()
    pages_big = fixture_pages_df(spark, include_big=True).coalesce(1)

    def go(item):
        name, (url, kw) = item
        p = pages_big if name == "oversize" else pages
        c = WaveCrawler(spark, p, CrawlerConfig(initial_url=url, **kw))
        c.run()
        return name, c

    specs = dict(CRAWL_SPECS)
    specs["oversize"] = (BASE + "/big", {})
    with ThreadPoolExecutor(max_workers=6) as ex:
        results = dict(ex.map(go, specs.items()))
    pages.unpersist()
    return results


def frontier_map(c):
    rows = c.frontier.orderBy("id").collect()
    return [(r["id"], r["url"], r["status"], r["fetched"], r["depth"]) for r in rows]


def content_row(c, url):
    return c.content.filter(f"url = '{url}'").collect()[0]


class TestMainCrawl:
    def test_fetch_start_order(self, crawls):
        # reliability.integration.spec.ts:244 — exactly 8 fetchstarts, FIFO
        urls = [u for (_, _, u) in crawls["main"].fetch_log]
        assert urls == [
            BASE + "/", BASE + "/sitemap.xml", BASE + "/stage2",
            BASE + "/stage/3", BASE + "/stage/4", BASE + "/stage5",
            BASE + "/stage6", BASE + "/nofollow",
        ]

    def test_final_statuses(self, crawls):
        fm = {u: s for (_, u, s, _, _) in frontier_map(crawls["main"])}
        assert fm == {
            BASE + "/": "downloaded",
            BASE + "/sitemap.xml": "notfound",
            BASE + "/stage2": "downloaded",
            BASE + "/stage/3": "downloaded",
            BASE + "/stage/4": "downloaded",
            BASE + "/stage5": "redirected",
            BASE + "/stage6": "downloaded",
            BASE + "/nofollow": "downloaded",
        }

    def test_ids_dense_fifo(self, crawls):
        ids = [i for (i, _, _, _, _) in frontier_map(crawls["main"])]
        assert ids == list(range(8))

    def test_forbidden_and_nofollow_never_queued(self, crawls):
        c = crawls["main"]
        assert c.events.get("fetchdisallowed", 0) >= 1
        urls = {u for (_, u, _, _, _) in frontier_map(c)}
        assert BASE + "/forbidden" not in urls
        assert BASE + "/stage7" not in urls

    def test_all_fetched_and_events(self, crawls):
        c = crawls["main"]
        assert all(f for (_, _, _, f, _) in frontier_map(c))
        assert c.events.get("cookieerror", 0) == 1   # '=test' cookie, routes.ts:29
        assert c.events.get("downloaded", 0) == 6    # 6 discoverycomplete pages


class TestRobotsDisobeyed:
    def test_forbidden_fetched_when_disrespected(self, crawls):
        urls = {u for (_, u, s, _, _) in frontier_map(crawls["no_robots"])}
        assert BASE + "/forbidden" in urls
        assert BASE + "/sitemap.xml" not in urls


class TestDepthLimits:
    # depth.integration.spec.ts:25-30 (fetchcomplete == downloaded count)
    @pytest.mark.parametrize("name,expected", [
        ("depth0", 11), ("depth1", 1), ("depth2", 3), ("depth3", 6)])
    def test_depth_counts(self, crawls, name, expected):
        assert crawls[name].events.get("downloaded", 0) == expected


class TestRedirects:
    def test_initial_domain_change_allowed(self, crawls):
        c = crawls["redir_allow"]
        urls = {u for (_, u, _, _, _) in frontier_map(c)}
        assert "http://localhost:3000/" in urls
        assert c.crawl_host == "localhost"

    def test_initial_domain_change_denied(self, crawls):
        # reference asserts 0 discoverycomplete events (spec :316-328); the
        # robots.txt sitemap is still queued (robots respected by default)
        c = crawls["redir_deny"]
        urls = {u for (_, u, _, _, _) in frontier_map(c)}
        assert "http://localhost:3000/" not in urls
        assert c.events.get("downloaded", 0) == 0
        assert c.events.get("invaliddomain", 0) == 1
        assert c.crawl_host == "127.0.0.1"

    def test_non_initial_redirect_keeps_host(self, crawls):
        c = crawls["redir_later"]
        urls = {u for (_, u, _, _, _) in frontier_map(c)}
        assert BASE + "/domain-redirect" in urls
        assert "http://localhost:3000/" not in urls
        assert c.crawl_host == "127.0.0.1"


class TestCrossPortRobots:
    def test_disallowed_on_second_host(self, crawls):
        c = crawls["cross_port"]
        fm = {u: s for (_, u, s, _, _) in frontier_map(c)}
        assert fm.get("http://127.0.0.1:3001/disallowed") == "disallowed"
        assert "http://127.0.0.1:3001/disallowed" not in \
            [u for (_, _, u) in c.fetch_log]


class TestTimeouts:
    def test_timeout_status(self, crawls):
        fm = {u: s for (_, u, s, _, _) in frontier_map(crawls["timeout"])}
        assert fm[BASE + "/timeout"] == "timeout"


class TestCompressed:
    def test_gzip_crawl_discovers_links(self, crawls):
        urls = {u for (_, u, _, _, _) in frontier_map(crawls["gz_link"])}
        assert BASE + "/compressed/gzip" in urls

    def test_gzip_text_decompressed(self, crawls):
        row = content_row(crawls["gz_body"], BASE + "/compressed/gzip")
        assert bytes(row["body"]) == b"Yay, you know how to deal with gzip compression!"

    def test_deflate(self, crawls):
        row = content_row(crawls["deflate"], BASE + "/compressed/deflate")
        assert bytes(row["body"]) == b"Yay, you know how to deal with deflate compression!"

    def test_raw_body_when_decompress_disabled(self, crawls):
        # resourcevalidity.integration.spec.ts:319-342
        row = content_row(crawls["gz_raw"], BASE + "/compressed/gzip")
        assert gzip.decompress(bytes(row["body"])) == \
            b"Yay, you know how to deal with gzip compression!"
        # but discovery/extraction always sees the decompressed body
        assert row["extracted_text"] == "Yay, you know how to deal with gzip compression!"


class TestDecoding:
    # resourcevalidity.integration.spec.ts:269-296
    @pytest.mark.parametrize("name,path,expected", [
        ("enc_header", "/encoded/header",
         "Eyjafjallajökull er fimmti stærsti jökull Íslands."),
        ("enc_inline", "/encoded/inline",
         "<meta charset=\"iso-8859-1\"><p>Pippi Långstrump är en av Astrid "
         "Lindgrens mest kända litterära figurer.<p>"),
        ("enc_old", "/encoded/old-inline",
         "<meta http-equiv=\"Content-Type\" content=\"text/html; "
         "charset=iso-8859-1\" /><p>Preikestolen er et fjellplatå på "
         "nordsiden av Lysefjorden i Forsand.<p>"),
        ("enc_empty", "/encoded/empty", ""),
    ])
    def test_decode_goldens(self, crawls, name, path, expected):
        row = content_row(crawls[name], BASE + path)
        assert row["text"].strip() == expected


class TestOversize:
    def test_fetchdataerror(self, crawls):
        # testcrawl.integration.spec.ts:274-284 — /big exceeds 16 MiB cap
        c = crawls["oversize"]
        assert c.events.get("fetchdataerror", 0) == 1
        fm = {u: (s, f) for (_, u, s, f, _) in frontier_map(c)}
        assert fm[BASE + "/big"] == ("spooled", True)


class TestForcedDuplicates:
    def test_force_add_bypasses_seen(self, spark):
        """queue.add(force=true) duplicate bypass (queue.ts:124-129) —
        'should add multiple items with the same URL to the queue if forced
        to', reliability.integration.spec.ts:88-108: plain re-add is a
        DUPLICATE error, forced re-add lands a second row."""
        pages = fixture_pages_df(spark).coalesce(1).cache()
        pages.count()
        c = WaveCrawler(spark, pages, CrawlerConfig(initial_url=BASE + "/"))
        c.seed()
        base_add = c.events.get("queueadd", 0)
        c.queue_url(BASE + "/stage2")
        c.queue_url(BASE + "/stage2")               # rejected: DUPLICATE
        c.queue_url(BASE + "/stage2", force=True)   # forced: second row
        assert c.events.get("queueadd", 0) - base_add == 2
        assert c.events.get("queueduplicate", 0) == 1
        rows = c.frontier.filter(f"url = '{BASE}/stage2'").collect()
        assert len(rows) == 2
        assert len({r["id"] for r in rows}) == 2
        assert all(r["status"] == "queued" for r in rows)
        assert c.queued_count == 3  # seed + stage2 x2
        # both forced rows fetch independently in the next wave
        c.run_wave()
        fetched = c.frontier.filter(
            f"url = '{BASE}/stage2' AND fetched").count()
        assert fetched == 2
        pages.unpersist()
