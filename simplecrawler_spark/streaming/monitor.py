"""Live crawl monitoring — Structured Streaming over the snapshot store.

The wave engine is batch (C1-C6 politeness semantics live in the wave
loop), but its snapshot store is a streaming-friendly log: every commit
appends ``deltas/seq=N/host_bucket=B/*.parquet`` row-version files. This
module tails that log with ``spark.readStream`` so an operator console can
watch a 10^10-URL crawl without touching the driver that runs it:

- ``frontier_updates``  — the raw row-version stream (one row per frontier
  mutation, exactly the event surface of §2.9: queueadd = first version,
  fetchstart/downloaded/... = status versions);
- ``status_counts``     — running counts per (status, host_bucket);
- ``wave_rates``        — per-wave processed/enqueued counters keyed by the
  ``wave`` column, the streaming view of the lineage table.

All aggregations are append-over-complete-files: a delta directory is
written atomically before the manifest commits (store.commit_wave), and
``maxFilesPerTrigger`` bounds each micro-batch, so the monitor scales by
partition count, not crawl size. Use ``trigger(availableNow=True)`` for a
catch-up pass or a processing-time trigger to follow live.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import store as _store
from ..schema import FRONTIER_SCHEMA


def frontier_updates(spark: SparkSession, store_path: str,
                     max_files_per_trigger: int = 64) -> DataFrame:
    """Streaming DataFrame of frontier row versions from a SnapshotStore."""
    # the glob tails every committed (or in-flight) delta — readers only
    # ever see whole files. host_bucket lives in the partition dir name,
    # which glob paths don't surface as a column — recover it from the
    # file path (works across seq=/base= generations alike).
    raw = (spark.readStream
           .schema(FRONTIER_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .option("pathGlobFilter", "*.parquet")
           .parquet(os.path.join(store_path, "deltas", "*", "*")))
    return raw.withColumn(
        "host_bucket",
        F.regexp_extract(F.input_file_name(), r"host_bucket=(\d+)", 1)
        .cast("int"))


def status_counts(updates: DataFrame) -> DataFrame:
    """Running (status, host_bucket) counts — the §2.9 event counters as a
    streaming aggregation (complete/update output mode)."""
    return (updates.groupBy("status", "host_bucket")
            .agg(F.count("*").alias("n"),
                 F.max("wave").alias("latest_wave")))


def wave_rates(updates: DataFrame) -> DataFrame:
    """Per-wave throughput counters: rows enqueued in wave W (their first
    version carries wave=W) and fetch outcomes committed at wave W."""
    return (updates.groupBy("wave")
            .agg(F.count("*").alias("row_versions"),
                 F.sum(F.when(F.col("status") == "queued", 1).otherwise(0))
                 .alias("enqueued"),
                 F.sum(F.when(F.col("fetched"), 1).otherwise(0))
                 .alias("fetched")))


def run_catchup(spark: SparkSession, store_path: str,
                checkpoint_dir: str, table_name: str = "crawl_status"
                ) -> DataFrame:
    """One availableNow catch-up pass into an in-memory table; returns the
    resulting status_counts snapshot DataFrame."""
    q = (status_counts(frontier_updates(spark, store_path))
         .writeStream
         .format("memory")
         .queryName(table_name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)
