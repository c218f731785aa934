"""Dense-id ranking — direct unit coverage of operators/ids.py.

The wave loop needs reference-identical dense queue ids (crawler.ts:1109
``queue.add`` assigns monotonically increasing ids in enqueue order).
``assign_dense_ids`` has three physical strategies; all must yield the
SAME mapping as a global ``row_number() over (order by ...)``:

- single-window path (count_hint <= 100k),
- two-phase sampling path (repartitionByRange + per-partition offsets),
- fully-lazy bounds path (bucket offset + row_number per bucket, zero
  driver actions) — the store-backed wave hot path.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.operators.ids import assign_dense_ids


def _skewed(spark, n=120_000):
    """Deterministic skewed frontier stand-in: leading key has heavy ties
    (power-law-ish residues) and (referrer, u) is a unique total order."""
    return spark.range(n).select(
        ((F.col("id") % 1000) * (F.col("id") % 1000) % 797)
        .cast("long").alias("referrer"),
        F.col("id").cast("long").alias("u"))


def _oracle_ids(rows, order_cols, start):
    pdf = pd.DataFrame(rows, columns=order_cols).sort_values(
        order_cols).reset_index(drop=True)
    return {tuple(t): start + i for i, t in enumerate(
        pdf.itertuples(index=False, name=None))}


def _check(df, order_cols, start, **kw):
    res, n = assign_dense_ids(df, order_cols, start, **kw)
    got = res.collect()
    oracle = _oracle_ids([[r[c] for c in order_cols] for r in got],
                         order_cols, start)
    assert len(got) == len(oracle)  # unique total order
    for r in got:
        assert r["id"] == oracle[tuple(r[c] for c in order_cols)]
    return n


def test_lazy_bounds_matches_global_rownumber(spark):
    df = _skewed(spark)
    n = _check(df, ["referrer", "u"], start=5,
               range_bounds=[10, 100, 400])
    assert n is None  # lazy path: caller recovers the count at its boundary


def test_lazy_bounds_builds_no_jobs(spark):
    """The bounds path is pure plan construction — zero driver actions.
    (The two-phase path launches a count job; the whole point of the lazy
    path is that a store-backed wave launches NO id/count job at all.)"""
    tracker = spark.sparkContext.statusTracker()
    df = _skewed(spark, 50_000)
    before = set(tracker.getJobIdsForGroup(None))
    res, n = assign_dense_ids(df, ["referrer", "u"], start=0,
                              range_bounds=[100, 400])
    assert n is None
    assert set(tracker.getJobIdsForGroup(None)) == before


@pytest.mark.parametrize("bounds", [
    [100_000],          # every key below the only bound: one bucket used
    [-5, 0, 1_000_000], # bounds outside the key range: empty edge buckets
    [400],              # single split
])
def test_lazy_bounds_degenerate(spark, bounds):
    """Bound placement only affects balance, never correctness: empty
    buckets and out-of-range splits still yield dense order-isomorphic
    ids because offsets come from exact lazy counts."""
    df = _skewed(spark, 20_000)
    _check(df, ["referrer", "u"], start=0, range_bounds=bounds)


def test_lazy_bounds_all_keys_equal(spark):
    df = spark.range(5_000).select(
        F.lit(7).cast("long").alias("referrer"),
        F.col("id").cast("long").alias("u"))
    _check(df, ["referrer", "u"], start=3, range_bounds=[7, 9])


def test_lazy_equals_two_phase(spark):
    """The lazy bounds path and the sampling two-phase path must assign
    the IDENTICAL id to every row (both are order-isomorphic to the same
    unique total order, so equality follows — assert it directly)."""
    df = _skewed(spark, 30_000)
    lazy, _ = assign_dense_ids(df, ["referrer", "u"], start=0,
                               range_bounds=[50, 200, 500])
    two, n = assign_dense_ids(df, ["referrer", "u"], start=0)
    assert n == 30_000
    mismatch = (lazy.select("referrer", "u", F.col("id").alias("id_lazy"))
                .join(two.select("referrer", "u", F.col("id").alias("id_two")),
                      ["referrer", "u"])
                .filter("id_lazy <> id_two").count())
    assert mismatch == 0


def test_lazy_bounds_empty_input(spark):
    df = _skewed(spark, 10).filter("u < 0")
    res, n = assign_dense_ids(df, ["referrer", "u"], start=0,
                              range_bounds=[100])
    assert n is None and res.count() == 0
