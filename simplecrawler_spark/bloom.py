"""Partitioned Bloom URL-seen side table (north_rule seen-structure).

One Bloom filter per ``host_bucket`` (the same ``xxhash64(host) % B`` salt
the frontier is partitioned by), persisted as a parquet side table of

    (host_bucket:int, bits:binary, m:long, k:int, n_items:long, fpr:double)

versioned Iceberg-style: every :meth:`add` writes a NEW version directory
and atomically flips a ``CURRENT`` pointer file, so a killed job resumes
against the last committed filter generation (the analog of an Iceberg
snapshot of the side table; SURVEY.md §7 item 4).

Design for scale:
- Key hashing stays JVM-side (two ``xxhash64`` columns inside whole-stage
  codegen); Python only ever sees int64 pairs, never URL strings.
- Bit get/set is vectorized numpy over Arrow batches; per-bucket filters are
  built/merged/probed with cogrouped ``applyInPandas`` so each task touches
  exactly one bucket's bitarray (no broadcast of the full filter set; at
  10^10 URLs / 4096 buckets and 10 bits/key a bucket blob is ~3 MB).
- Probe has NO false negatives (double hashing g_i = h1 + i*h2 identical in
  set and probe, both uint64 wraparound): rows the filter rejects are
  *definitely fresh* and skip the exact anti-join; only ``maybe_seen`` rows
  (a ``target_fpr`` sliver of the candidate set at steady state) fall back
  to the exact join — which preserves the reference's exact URL-seen
  semantics (/root/reference/src/queue.ts:80-98 oldURL suppression) while
  shrinking the big shuffle by ~(1 - dup_rate - fpr).
- ``fpr`` per bucket is the analytic (1 - e^{-kn/m})^k from the tracked
  insert count — recorded into per-partition lineage by the snapshot store.
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .timing import timed as _timed

from .sidetable import VersionedSideTable

FILTER_SCHEMA = T.StructType([
    T.StructField("host_bucket", T.IntegerType()),
    T.StructField("bits", T.BinaryType()),
    T.StructField("m", T.LongType()),
    T.StructField("k", T.IntegerType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("fpr", T.DoubleType()),
])

_H1_SEED = 0          # F.xxhash64(url)           — default seed 42 internally
_H2_SEED = 0x9E3779B9  # F.xxhash64(url, lit(seed))


def _hash_cols(url_col: str):
    """Two independent 64-bit hashes, computed JVM-side."""
    return (F.xxhash64(F.col(url_col)).alias("__h1"),
            F.xxhash64(F.col(url_col), F.lit(_H2_SEED)).alias("__h2"))


def _sizing(capacity: int, target_fpr: float):
    m = max(64, int(math.ceil(-capacity * math.log(target_fpr)
                              / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8  # whole bytes
    k = max(1, round(m / capacity * math.log(2)))
    return m, int(k)


def _indices(h1: pd.Series, h2: pd.Series, k: int, m: int) -> np.ndarray:
    """(k, n) array of bit positions; uint64 wraparound double hashing."""
    a = h1.to_numpy(dtype=np.int64).view(np.uint64)
    b = h2.to_numpy(dtype=np.int64).view(np.uint64)
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return ((a[None, :] + ks * b[None, :]) % np.uint64(m)).astype(np.int64)


def _analytic_fpr(k: int, n: int, m: int) -> float:
    return float((1.0 - math.exp(-k * n / m)) ** k)


class BloomSideTable(VersionedSideTable):
    """Persisted, partitioned, mergeable Bloom filter keyed by host_bucket.

    Versioned-dir persistence (delta manifests, CURRENT pointer, pruning,
    compaction cadence) lives in :class:`VersionedSideTable`, shared with
    the cuckoo variant."""

    SCHEMA = FILTER_SCHEMA

    def __init__(self, path: str, spark: SparkSession,
                 capacity_per_bucket: int = 100_000,
                 target_fpr: float = 0.01, keep_versions: int = 2,
                 compact_after: int = 8):
        super().__init__(path, spark, keep_versions=keep_versions,
                         compact_after=compact_after)
        self.capacity = capacity_per_bucket
        self.target_fpr = target_fpr
        self.m, self.k = _sizing(capacity_per_bucket, target_fpr)

    # ----------------------------------------------------------------- add
    def add(self, df: DataFrame, url_col: str = "url",
            bucket_col: str = "host_bucket") -> None:
        """OR the keys of ``df`` into the per-bucket filters; commits a new
        side-table version. Duplicate keys are harmless (idempotent; they
        are also deduped per bucket so ``n_items`` — and the analytic FPR
        derived from it — counts distinct inserted keys).

        Delta-OR: only buckets that actually receive keys are rewritten;
        untouched buckets stay in their prior version dirs, referenced by
        this version's MANIFEST.json. Every ``compact_after`` generations
        the whole table is compacted into one dir. At the README's 4096 ×
        3 MB sizing a wave touching 5% of hosts writes ~0.6 GB instead of
        ~12 GB."""
        m, k = self.m, self.k
        keys = df.select(F.col(bucket_col).cast("int").alias("host_bucket"),
                         *_hash_cols(url_col))
        with _timed("    bloom/touched-collect"):
            touched = sorted(int(r[0]) for r in
                             keys.select("host_bucket").distinct().collect())
        if not touched:
            return
        base, compact = self._delta_plan(touched)

        def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            # left: 0-1 existing filter rows; right: new keys (one bucket)
            right = right.drop_duplicates(subset=["__h1", "__h2"])
            if len(left):
                row = left.iloc[0]
                bits = np.frombuffer(row["bits"], dtype=np.uint8).copy()
                fm, fk, n = int(row["m"]), int(row["k"]), int(row["n_items"])
                bucket = int(row["host_bucket"])
            else:
                fm, fk, n = m, k, 0
                bits = np.zeros(fm // 8, dtype=np.uint8)
                bucket = int(right["host_bucket"].iloc[0])
            if len(right):
                idx = _indices(right["__h1"], right["__h2"], fk, fm).ravel()
                np.bitwise_or.at(bits, idx >> 3,
                                 (1 << (idx & 7)).astype(np.uint8))
                n += len(right)
            return pd.DataFrame([{
                "host_bucket": bucket, "bits": bits.tobytes(), "m": fm,
                "k": fk, "n_items": n, "fpr": _analytic_fpr(fk, n, fm)}])

        merged = (base.groupBy("host_bucket")
                  .cogroup(keys.groupBy("host_bucket"))
                  .applyInPandas(merge, FILTER_SCHEMA))
        with _timed("    bloom/merge-commit"):
            self._commit_delta(merged, touched, compact)

    # --------------------------------------------------------------- probe
    def probe(self, df: DataFrame, url_col: str = "url",
              bucket_col: str = "host_bucket",
              out_col: str = "__maybe_seen") -> DataFrame:
        """Return ``df`` + boolean ``out_col``. False ⇒ key definitely never
        added (no false negatives); True ⇒ added OR a false positive
        (~``fpr`` of fresh keys) — resolve those with the exact anti-join."""
        cur = self.filters()
        if cur is None:
            return df.withColumn(out_col, F.lit(False))
        in_cols = df.columns
        probe_in = df.withColumn("__h1", F.xxhash64(F.col(url_col))) \
                     .withColumn("__h2", F.xxhash64(F.col(url_col),
                                                    F.lit(_H2_SEED)))
        out_schema = T.StructType(
            [probe_in.schema[c] for c in in_cols] +
            [T.StructField(out_col, T.BooleanType())])

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return pd.DataFrame(columns=[*in_cols, out_col])
            if not len(right):
                res = np.zeros(len(left), dtype=bool)
            else:
                row = right.iloc[0]
                bits = np.frombuffer(row["bits"], dtype=np.uint8)
                fm, fk = int(row["m"]), int(row["k"])
                idx = _indices(left["__h1"], left["__h2"], fk, fm)
                hit = (bits[idx >> 3] >> (idx & 7)) & 1
                res = hit.all(axis=0).astype(bool)
            out = left[in_cols].copy()
            out[out_col] = res
            return out

        return (probe_in.groupBy(F.col(bucket_col).cast("int"))
                .cogroup(cur.groupBy("host_bucket"))
                .applyInPandas(check, out_schema))

    # ------------------------------------------------------------- metrics
    def fpr_by_bucket(self) -> dict:
        cur = self.filters()
        if cur is None:
            return {}
        return {int(r["host_bucket"]): float(r["fpr"])
                for r in cur.select("host_bucket", "fpr").collect()}
