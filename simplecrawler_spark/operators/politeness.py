"""Per-host politeness: wave token budgets (C1/C2 analog).

The reference spawns ≤1 request per ``interval`` ms from a global FIFO
(/root/reference/src/crawler.ts:297,666,1273-1284). With the default
``filterByDomain=true`` a crawl is single-host, so the global interval IS a
per-host politeness interval; the wave engine generalizes it: each wave
grants each host ``tokens`` fetches, taken in FIFO (id) order. Excess rows
stay ``queued`` for later waves.

Scale notes: the ranking window shuffles only ``status == 'queued'`` rows
(filter is pushed below the exchange); hot hosts skew the *fetch* stage, not
this ranking, and the fetch stage re-partitions on (host_bucket, id) salt —
see WaveCrawler. AQE skew-join handles the join side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def select_due(frontier: DataFrame, tokens_per_host: Optional[int]) -> DataFrame:
    """FIFO head selection (Q5 generalized): all queued rows, optionally
    budget-capped per host in id order."""
    queued = frontier.filter(F.col("status") == "queued")
    if tokens_per_host is None:
        return queued
    w = Window.partitionBy("host").orderBy("id")
    return (queued.withColumn("__rk", F.row_number().over(w))
                  .filter(F.col("__rk") <= tokens_per_host)
                  .drop("__rk"))
