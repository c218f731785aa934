"""Queue analytics goldens — ported from queue.integration.spec.ts:85-160
over the frozen-queue fixture test/fixtures/queue.json (4 items)."""

import pytest

from simplecrawler_spark.operators.analytics import (InvalidStatisticError,
                                                     QueueAnalytics)
from simplecrawler_spark.schema import FRONTIER_SCHEMA


def _state(request_latency=None, request_time=None, download_time=None,
           content_length=None, content_type=None, code=None,
           actual_data_size=None, sent_incorrect_size=None, headers=None):
    return dict(request_latency=request_latency, request_time=request_time,
                download_time=download_time, content_length=content_length,
                content_type=content_type, code=code, headers=headers or {},
                actual_data_size=actual_data_size,
                sent_incorrect_size=sent_incorrect_size)


def _item(id, url, path, depth, fetched, status, state=None, referrer=""):
    return dict(id=id, url=url, protocol="http", host="127.0.0.1", port=3000,
                path=path, uri_path=path, depth=depth, referrer=referrer,
                fetched=fetched, status=status, wave=0, host_bucket=0,
                is_seed_chain=False, state=state)


# test/fixtures/queue.json, verbatim values
FIXTURE_ITEMS = [
    _item(0, "http://127.0.0.1:3000/", "/", 1, True, "downloaded",
          _state(1, 2, 2, 68, "text/html", 200, 68, False)),
    _item(1, "http://127.0.0.1:3000/404", "/404", 2, True, "notfound",
          _state(2, 2, None, 14, "text/html", 404, None, None)),
    _item(2, "http://127.0.0.1:3000/stage2", "/stage2", 2, True, "downloaded",
          _state(4, 5, 1, 37, "text/html", 200, 37, False),
          referrer="http://127.0.0.1:3000/"),
    _item(3, "http://127.0.0.1:3000/stage/3", "/stage/3", 3, False, "queued",
          None, referrer="http://127.0.0.1:3000/stage2"),
]


@pytest.fixture(scope="module")
def q(spark):
    df = spark.createDataFrame(FIXTURE_ITEMS, FRONTIER_SCHEMA).coalesce(1).cache()
    df.count()
    return QueueAnalytics(df)


def test_oldest_unfetched(q):
    assert q.oldest_unfetched_item()["url"] == "http://127.0.0.1:3000/stage/3"


def test_max(q):
    assert q.max("downloadTime") == 2


def test_min(q):
    assert q.min("requestTime") == 2


def test_avg(q):
    assert q.avg("contentLength") == (68 + 14 + 37) / 3


def test_count_fetched(q):
    assert q.count_items({"fetched": True}) == 3


def test_filter_by_status(q):
    urls = {r["url"] for r in q.filter_items({"status": "downloaded"})}
    assert urls == {"http://127.0.0.1:3000/", "http://127.0.0.1:3000/stage2"}


def test_count_queued(q):
    assert q.count_items({"status": "queued"}) == 1


def test_count_nested_state_code(q):
    # queue.integration.spec.ts:144-152
    assert q.count_items({"stateData": {"code": 200}}) == 2


def test_count_failed_and_notfound(q):
    assert q.count_items({"status": "failed"}) == 0
    assert q.count_items({"status": "notfound"}) == 1


def test_get_length(q):
    assert q.get_length() == 4


def test_invalid_statistic(q):
    with pytest.raises(InvalidStatisticError, match="Invalid statistic"):
        q.max("invalidStatistic")


def test_get_by_index(q):
    assert q.get(2)["url"] == "http://127.0.0.1:3000/stage2"
    with pytest.raises(IndexError):
        q.get(99)


def test_update_deep_assign(q):
    # queue.ts:157-174: top-level overwrite + nested stateData merge
    out = QueueAnalytics(q.frontier).update(
        2, {"status": "failed", "stateData": {"code": 503}})
    r = {x["id"]: x for x in out.orderBy("id").collect()}
    assert r[2]["status"] == "failed"
    assert r[2]["state"]["code"] == 503
    assert r[2]["state"]["content_length"] == 37   # untouched fields survive
    assert r[0]["status"] == "downloaded"          # other rows untouched
    with pytest.raises(IndexError):
        QueueAnalytics(q.frontier).update(99, {"status": "failed"})
    with pytest.raises(KeyError):
        QueueAnalytics(q.frontier).update(0, {"bogus": 1})


def test_update_materializes_null_state(q):
    out = QueueAnalytics(q.frontier).update(
        3, {"stateData": {"code": 600}})
    r = out.filter("id = 3").first()
    assert r["state"]["code"] == 600
    assert r["state"]["content_type"] is None
