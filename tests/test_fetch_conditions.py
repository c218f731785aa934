"""Fetch-condition referrer parity (P8).

Port of /root/reference/test/specs/conditions.integration.spec.ts:131-183
("should provide fetch conditions with the right data"): the condition for
the /stage2 discovery must observe the FULL referrer QueueItem — url, depth,
protocol, host, port, path, fetched — plus stateData (contentLength 68,
contentType text/html, code 200, headers["content-length"] == "68",
requestLatency/requestTime present).

Conditions run executor-side (mapInPandas), so the assertions are encoded as
the predicate's return value: any missing/mismatched referrer field rejects
the candidate, which would visibly change the frontier golden and raise the
fetchprevented counter — both asserted to stay at the no-condition values.
"""

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.fixture_site import fixture_pages_df

BASE = "http://127.0.0.1:3000"


def _stage2_referrer_check(item, referrer):
    if item.get("url") != BASE + "/stage2":
        return True
    # conditions.integration.spec.ts:137-171 field-by-field
    if referrer is None:
        return False
    st = referrer.get("state") or {}
    hdrs = st.get("headers") or {}
    return (referrer.get("url") == BASE + "/"
            and referrer.get("depth") == 1
            and referrer.get("protocol") == "http"
            and referrer.get("host") == "127.0.0.1"
            and referrer.get("port") == 3000
            and referrer.get("path") == "/"
            and referrer.get("fetched") is True
            and st.get("content_length") == 68
            and st.get("content_type") == "text/html"
            and st.get("code") == 200
            and "request_latency" in st
            and "request_time" in st
            and hdrs.get("content-length") == "68"
            # queueItem side (crawler.ts asserts url/depth/host/port/path)
            and item.get("depth") == 2
            and item.get("path") == "/stage2"
            and item.get("host") == "127.0.0.1"
            and item.get("port") == 3000)


def _reject_stage5(item, referrer):
    return item.get("url") != BASE + "/stage5"


def test_condition_sees_full_referrer_item(spark):
    pages = fixture_pages_df(spark).coalesce(1)
    c = WaveCrawler(spark, pages, CrawlerConfig(
        initial_url=BASE + "/",
        fetch_conditions=[_stage2_referrer_check]))
    c.run()
    fm = {r["url"]: r["status"] for r in c.frontier.collect()}
    # identical to the no-condition main golden: the referrer-checking
    # condition approved every candidate, so nothing was prevented
    assert fm[BASE + "/stage2"] == "downloaded"
    assert len(fm) == 8
    assert c.events.get("fetchprevented", 0) == 0
    assert c.events.get("fetchconditionerror", 0) == 0


def test_condition_rejects_and_counts(spark):
    # conditions.integration.spec.ts:185-199 (synchronous false ⇒ prevented)
    pages = fixture_pages_df(spark).coalesce(1)
    c = WaveCrawler(spark, pages, CrawlerConfig(
        initial_url=BASE + "/",
        fetch_conditions=[_reject_stage5]))
    c.run()
    urls = {r["url"] for r in c.frontier.collect()}
    assert BASE + "/stage5" not in urls
    assert c.events.get("fetchprevented", 0) >= 1
    assert c.events.get("fetchconditionerror", 0) == 0
