"""Per-host politeness: wave token budgets (C1/C2 analog).

The reference spawns ≤1 request per ``interval`` ms from a global FIFO
(/root/reference/src/crawler.ts:297,666,1273-1284). With the default
``filterByDomain=true`` a crawl is single-host, so the global interval IS a
per-host politeness interval; the wave engine generalizes it: each wave
grants each host ``tokens`` fetches, taken in FIFO (id) order. Excess rows
stay ``queued`` for later waves.

Scale notes: the ranking is a two-phase top-k so a hot host holding half a
10^10-row frontier never sorts in one task. Phase 1 pre-ranks within
``(host, id % salt)`` groups — each group keeps at most ``tokens`` rows, so
at most ``salt * tokens`` rows per host survive to phase 2's exact per-host
rank. Phase 1 is exact-preserving: any id among a host's overall ``tokens``
smallest has at most ``tokens - 1`` smaller ids in its own salt group, so it
always survives the pre-cut. Both phases shuffle only ``status == 'queued'``
rows (the filter is pushed below the exchange), and the phase-2 input is
bounded by ``salt * tokens`` rows per host regardless of frontier size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

# salt width for the phase-1 pre-rank: a 50%-of-frontier host spreads over
# 64 sort groups (each ~0.8% of rows, so hash collisions into shuffle
# partitions stay near-uniform) while the phase-2 survivor set stays tiny
# (≤ 64 * tokens rows per host)
DEFAULT_RANK_SALT = 64


# below this queued-row count the salted pre-rank cannot pay for its extra
# full shuffle+sort: even a host owning EVERY queued row sorts at most this
# many rows in phase 2's single task, which is a sub-second sort. The
# two-phase path exists for the 10^9+-row regime where one host's queue
# share would otherwise be an unboundedly large single-task sort.
TWO_PHASE_MIN_ROWS = 2_000_000


def select_due(frontier: DataFrame, tokens_per_host: Optional[int],
               salt: int = DEFAULT_RANK_SALT,
               approx_rows: Optional[int] = None,
               two_phase_min_rows: int = TWO_PHASE_MIN_ROWS,
               host_budgets: Optional[dict] = None) -> DataFrame:
    """FIFO head selection (Q5 generalized): all queued rows, optionally
    budget-capped per host in id order via a skew-safe two-phase top-k.

    ``approx_rows``: caller-known queued-row count (the wave engine tracks
    it incrementally — free). When provided and below
    ``two_phase_min_rows``, phase 1 is skipped: a frontier that small sorts
    any host in one task faster than the pre-rank's extra shuffle costs.
    When unknown (None), the skew-safe path is taken unconditionally.

    ``host_budgets``: optional host → tokens overrides (each ≤
    ``tokens_per_host``) — the robots Crawl-delay consumer. Joined in as a
    broadcast side table, so the budget lookup never ships a literal map
    through the plan; hosts absent from the map keep the default budget.
    The two-phase pre-cut stays at ``tokens_per_host`` (the maximum), which
    preserves exactness for every per-host budget below it."""

    def _cap(ranked: DataFrame) -> DataFrame:
        cols = [c for c in ranked.columns if c != "__rk"]
        if not host_budgets:
            return (ranked.filter(F.col("__rk") <= tokens_per_host)
                    .drop("__rk"))
        spark = ranked.sparkSession
        bdf = spark.createDataFrame(
            list(host_budgets.items()), "host string, __budget int")
        # re-select the input column order: the equi-join hoists the join
        # key to the front, which would break positional consumers
        return (ranked.join(F.broadcast(bdf), "host", "left")
                .filter(F.col("__rk") <= F.coalesce(F.col("__budget"),
                                                    F.lit(tokens_per_host)))
                .select(*cols))

    queued = frontier.filter(F.col("status") == "queued")
    if tokens_per_host is None:
        return queued
    if approx_rows is not None and approx_rows < two_phase_min_rows:
        w2 = Window.partitionBy("host").orderBy("id")
        return _cap(queued.withColumn("__rk", F.row_number().over(w2)))
    # phase 1: pre-rank within (host, xxhash64(id) % salt) groups — bounds
    # any single task's sort to ~1/salt of a hot host's rows. Hashing the id
    # (rather than id % salt) keeps groups uniform even when a host's ids
    # share arithmetic structure (e.g. per-wave striding). Any deterministic
    # grouping preserves exactness: a top-`tokens` id has at most tokens-1
    # smaller ids in whatever group it lands in.
    w1 = Window.partitionBy(
        "host", F.pmod(F.xxhash64(F.col("id")), F.lit(salt))).orderBy("id")
    pre = (queued.withColumn("__rk", F.row_number().over(w1))
                 .filter(F.col("__rk") <= tokens_per_host).drop("__rk"))
    # phase 2: exact per-host rank over ≤ salt*tokens survivors per host
    w2 = Window.partitionBy("host").orderBy("id")
    return _cap(pre.withColumn("__rk", F.row_number().over(w2)))
