"""Stateful streaming politeness gate (applyInPandasWithState).

Two trigger regimes, both BOUNDED:
- availableNow with drain_wakeups=False — deterministic: the query
  terminates after the data batches; backlog stays in state.
- processingTime with drain_wakeups=True — the wake-up path drains the
  backlog with no new input; polled with a hard deadline, then stopped.
  (A pending ProcessingTimeTimeout under availableNow keeps Spark's
  micro-batch engine cycling forever instead of terminating — that exact
  hang is why the regimes are separated here.)
"""

import os
import time

from simplecrawler_spark.streaming.politeness_state import politeness_gate


def _write_batches(spark, src):
    os.makedirs(src)
    rows1 = [("hot.test", f"http://hot.test/p/{i}") for i in range(10)] + \
            [("cold.test", f"http://cold.test/p/{i}") for i in range(2)]
    spark.createDataFrame(rows1, "host string, url string") \
        .coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([("hot.test", "http://hot.test/p/99")],
                          "host string, url string") \
        .coalesce(1).write.parquet(src + "/b2")


def _stream(spark, src):
    return (spark.readStream
            .schema("host string, url string")
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(src + "/*"))


def test_token_bucket_defers_fifo_available_now(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_batches(spark, src)
    gated = politeness_gate(_stream(spark, src), rate=4.0, burst=4.0,
                            drain_wakeups=False)
    q = (gated.writeStream.format("memory").queryName("t_gate")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "availableNow query failed to terminate"
    out = spark.table("t_gate").collect()

    hot = [r for r in out if r["host"] == "hot.test" and r["admitted"]]
    cold = [r for r in out if r["host"] == "cold.test" and r["admitted"]]
    assert len(cold) == 2                   # under budget: all admitted
    # hot host: exactly 4 per data batch (burst=4, rate=4); the remaining
    # 3 URLs wait in state for the next run over the same checkpoint
    assert len(hot) == 8
    admitted_urls = [r["url"] for r in hot]
    assert admitted_urls[:4] == [f"http://hot.test/p/{i}" for i in range(4)]
    assert admitted_urls[4:8] == [f"http://hot.test/p/{i}" for i in range(4, 8)]
    assert len(set(admitted_urls)) == len(admitted_urls)  # no dupes
    assert all(not r["admitted"] or r["batch_tokens_left"] >= 0.0
               for r in out)


def test_drain_wakeups_empty_backlog(spark, tmp_path):
    """With a continuous trigger, the re-armed processing-time timeout
    drains the deferred URLs with NO further input — all 11 hot URLs are
    eventually admitted, FIFO, never more than burst per batch."""
    src = str(tmp_path / "in")
    _write_batches(spark, src)
    gated = politeness_gate(_stream(spark, src), rate=4.0, burst=4.0,
                            drain_wakeups=True)
    q = (gated.writeStream.format("memory").queryName("t_drain")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 120
        hot = []
        while time.time() < deadline:
            hot = [r for r in spark.table("t_drain").collect()
                   if r["host"] == "hot.test" and r["admitted"]]
            if len(hot) >= 11:
                break
            time.sleep(1.0)
    finally:
        q.stop()
    assert len(hot) == 11, f"drain incomplete: {len(hot)}/11 admitted"
    assert [r["url"] for r in hot] == \
        [f"http://hot.test/p/{i}" for i in range(10)] + \
        ["http://hot.test/p/99"]
