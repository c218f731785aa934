"""Stateful streaming politeness gate (applyInPandasWithState)."""

import os
import time

from pyspark.sql import functions as F

from simplecrawler_spark.streaming.politeness_state import politeness_gate


def test_token_bucket_defers_then_drains(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    # batch 1: hot host floods 10 urls, cold host sends 2
    rows1 = [("hot.test", f"http://hot.test/p/{i}") for i in range(10)] + \
            [("cold.test", f"http://cold.test/p/{i}") for i in range(2)]
    spark.createDataFrame(rows1, "host string, url string") \
        .coalesce(1).write.parquet(src + "/b1")
    # batch 2: one more hot url arrives
    spark.createDataFrame([("hot.test", "http://hot.test/p/99")],
                          "host string, url string") \
        .coalesce(1).write.parquet(src + "/b2")

    stream = (spark.readStream
              .schema("host string, url string")
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet")
              .parquet(src + "/*"))
    gated = politeness_gate(stream, rate=4.0, burst=4.0)
    q = (gated.writeStream.format("memory").queryName("t_gate")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("t_gate").collect()

    hot = [r for r in out if r["host"] == "hot.test" and r["admitted"]]
    cold = [r for r in out if r["host"] == "cold.test" and r["admitted"]]
    assert len(cold) == 2                   # under budget: all admitted
    # hot host: 4 per batch (burst=4, rate=4) — never more than budget,
    # backlog carried in state, drained FIFO across batches
    assert 4 <= len(hot) <= 8
    admitted_urls = [r["url"] for r in hot]
    assert admitted_urls[:4] == [f"http://hot.test/p/{i}" for i in range(4)]
    assert len(set(admitted_urls)) == len(admitted_urls)  # no dupes
    assert all(not r["admitted"] or r["batch_tokens_left"] >= 0.0
               for r in out)
