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

``range_bounds`` removes the ranking's fixed jobs ENTIRELY — the path is
fully lazy. ``repartitionByRange`` launches a reservoir-sampling pass over
the whole input just to pick partition bounds; when the caller already knows
approximate quantiles of the leading sort key (the wave loop aggregates
``approx_percentile(referrer_id)`` on the SAME fused action that computes
every wave counter — zero extra jobs), we bucket deterministically on those
bounds instead: bucket index is monotone in the sort key, so dense ids are
``bucket_offset + row_number within bucket``. Both pieces are plain plan
nodes, not driver actions: per-bucket counts are a tiny aggregate over the
bucket shuffle, cumulative offsets a ≤#buckets-row window, broadcast-joined
back; the rank is a pure-JVM ``row_number`` window partitioned by bucket.
The bucket shuffle is shared by both branches (same Exchange → ReuseExchange),
so the input lineage (dedupe window + seen anti-join in the wave loop)
evaluates ONCE, when the caller's own materialization boundary — the wave
commit — runs. Zero extra job launches, zero persists, zero python passes
per wave. Bound skew only affects balance — never correctness — because
offsets come from exact lazy counts.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_dense_ids(df: DataFrame, order_cols: List[str], start: int,
                     out_col: str = "id", num_partitions: int = None,
                     count_hint: int = None, cache_registry: list = None,
                     range_bounds: Optional[List[int]] = None):
    """Add ``out_col`` = start, start+1, ... following sort order of
    ``order_cols``. Returns ``(DataFrame, total_or_None)`` — the two-phase
    path knows the exact row count from its partition-count phase (one job
    the caller would otherwise re-run); the window path returns None.

    ``count_hint`` (an upper bound on rows, if known) selects the cheap
    single-partition window for small inputs; the distributed two-phase
    ranking kicks in above 100k rows (or always when no hint is given).

    ``cache_registry``: when given, the id-assignment pass is returned LAZY
    (no localCheckpoint job — the caller's own materialization boundary,
    e.g. the wave commit, evaluates it once) and the persisted sort-phase
    DataFrame is appended to the registry for the caller to unpersist
    after that boundary. Saves one driver barrier per wave.

    ``range_bounds``: ascending split points for ``order_cols[0]`` (e.g.
    approx percentiles the caller piggybacked on an earlier action). When
    given, the path is FULLY LAZY (returns ``(df, None)``, no driver
    action): rows bucket to ``#bounds <= key`` deterministically, bucket
    offsets are a lazy count-aggregate + cumulative window broadcast-joined
    back over the SAME bucket shuffle (ReuseExchange — the input lineage
    evaluates once, at the caller's materialization boundary), and the id
    is ``offset + row_number() within bucket`` — pure JVM, no python pass.
    The caller recovers the exact row count from its own boundary (the
    wave commit reads it from the delta's parquet footers).
    """
    from pyspark.sql import Window
    if count_hint is not None and count_hint <= 100_000:
        w = Window.orderBy(*order_cols)
        return df.coalesce(1).withColumn(
            out_col,
            (F.row_number().over(w) + F.lit(start - 1)).cast("long")), None
    spark = df.sparkSession
    n = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    sort_cols = [F.col(c) for c in order_cols]
    if range_bounds:
        # fully-lazy ranking: bucket index is monotone in the leading sort
        # key, so dense order-isomorphic ids = bucket offset + rank within
        # bucket. One explicit hash shuffle on the bucket id is shared by
        # the counts branch and the rank branch (identical Exchange →
        # ReuseExchange): lineage runs once, the window's distribution
        # requirement is already satisfied, and the tiny offsets plan
        # (≤ len(bounds)+1 rows) rides a broadcast join.
        arr = F.array(*[F.lit(int(b)).cast("long") for b in range_bounds])
        lead = F.col(order_cols[0]).cast("long")
        bucket = F.aggregate(
            arr, F.lit(0),
            lambda acc, b: acc + F.when(lead >= b, 1).otherwise(0))
        parted = df.withColumn("__pid", bucket).repartition(n, "__pid")
        counts = parted.groupBy("__pid").agg(F.count("*").alias("__cnt"))
        cumw = (Window.orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1))
        offsets = counts.select(
            "__pid",
            (F.coalesce(F.sum("__cnt").over(cumw), F.lit(0))
             + F.lit(start)).cast("long").alias("__off"))
        rankw = Window.partitionBy("__pid").orderBy(*sort_cols)
        result = (parted.join(F.broadcast(offsets), "__pid")
                  .withColumn(out_col,
                              (F.col("__off") + F.row_number().over(rankw)
                               - F.lit(1)).cast("long"))
                  .drop("__pid", "__off"))
        return result, None
    # __pid is embedded as DATA on the persisted sort phase (not read from
    # TaskContext at id-assignment time): when the lazy result is unioned
    # into a larger plan, union renumbers task partition ids, which silently
    # shifted every offset lookup — data-embedded ids are immune. Range
    # partitioning assigns ascending key ranges to ascending partition ids,
    # so cumulative offsets in __pid order follow the sort order.
    parted = (df.repartitionByRange(n, *sort_cols)
                .sortWithinPartitions(*sort_cols)
                .withColumn("__pid", F.spark_partition_id()))
    parted = parted.persist()
    try:
        # phase 1: per-partition counts — pure JVM agg, no python pass
        counts = {r["__pid"]: r["cnt"] for r in
                  parted.groupBy("__pid").agg(F.count("*").alias("cnt"))
                  .collect()}
        offsets = {}
        acc = start
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
            + [f"{out_col} long"])

        def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # rows arrive sorted within the partition; one __pid per
            # partition here, but a group can span multiple Arrow batches
            cur_pid = None
            off = None
            for pdf in it:
                if not len(pdf):
                    continue
                parts = []
                for pid_val, grp in pdf.groupby("__pid", sort=True):
                    if pid_val != cur_pid:
                        cur_pid = pid_val
                        off = offsets[int(pid_val)]
                    grp = grp.drop(columns="__pid")
                    grp[out_col] = range(off, off + len(grp))
                    off += len(grp)
                    parts.append(grp)
                yield parts[0] if len(parts) == 1 else pd.concat(parts)

        result = parted.mapInPandas(add_ids, out_schema)
        if cache_registry is not None:
            cache_registry.append(parted)
            return result, acc - start
        # materialization boundary so the unpersist below is safe
        result = result.localCheckpoint(eager=True)
        return result, acc - start
    finally:
        if cache_registry is None:
            parted.unpersist()
