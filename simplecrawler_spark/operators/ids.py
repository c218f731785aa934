"""Distributed dense id assignment.

The reference assigns ``id = queue.length`` at enqueue time
(/root/reference/src/queue.ts:113); FIFO fetch order == id order. In the
wave engine new URLs are appended per wave in (referrer_id, pos) order, so
ids must be dense and order-isomorphic to that sort key.

A global ``row_number()`` window would funnel every candidate through ONE
partition — fine at test scale, a bottleneck at 10^10 URLs. Instead we use
the classic two-phase ranking: range-partition + sort on the key, count rows
per partition (one light job), then add cumulative offsets per partition in
a mapInPandas pass. Both phases are fully parallel; the only driver state is
one integer per partition.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark import TaskContext


def assign_dense_ids(df: DataFrame, order_cols: List[str], start: int,
                     out_col: str = "id", num_partitions: int = None,
                     count_hint: int = None):
    """Add ``out_col`` = start, start+1, ... following sort order of
    ``order_cols``. Returns ``(DataFrame, total_or_None)`` — the two-phase
    path knows the exact row count from its partition-count phase (one job
    the caller would otherwise re-run); the window path returns None.

    ``count_hint`` (an upper bound on rows, if known) selects the cheap
    single-partition window for small inputs; the distributed two-phase
    ranking kicks in above 100k rows (or always when no hint is given).
    """
    if count_hint is not None and count_hint <= 100_000:
        from pyspark.sql import Window
        w = Window.orderBy(*order_cols)
        return df.coalesce(1).withColumn(
            out_col,
            (F.row_number().over(w) + F.lit(start - 1)).cast("long")), None
    spark = df.sparkSession
    n = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    sort_cols = [F.col(c) for c in order_cols]
    parted = (df.repartitionByRange(n, *sort_cols)
                .sortWithinPartitions(*sort_cols))
    parted = parted.persist()
    try:
        # phase 1: per-partition counts (cheap: count aggregation only)
        counts_schema = "pid int, cnt long"

        def count_parts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid = TaskContext.get().partitionId()
            total = 0
            for pdf in it:
                total += len(pdf)
            yield pd.DataFrame({"pid": [pid], "cnt": [total]})

        counts = {r["pid"]: r["cnt"]
                  for r in parted.mapInPandas(count_parts, counts_schema).collect()}
        offsets = {}
        acc = start
        for pid in range(n):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
            + [f"{out_col} long"])

        def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid = TaskContext.get().partitionId()
            off = offsets.get(pid, 0)
            for pdf in it:
                pdf = pdf.copy()
                pdf[out_col] = range(off, off + len(pdf))
                off += len(pdf)
                yield pdf

        result = parted.mapInPandas(add_ids, out_schema)
        # materialization boundary so the unpersist below is safe
        result = result.localCheckpoint(eager=True)
        return result, acc - start
    finally:
        parted.unpersist()
