"""Partitioned cuckoo-filter URL-seen side table (north_rule names the
seen-structure as "Bloom/cuckoo" — this is the cuckoo variant; bloom.py is
the Bloom one; both share VersionedSideTable persistence and plug into the
crawler behind the same 4-method interface: add / probe / version /
fpr_by_bucket, selected by ``config.seen_filter``).

Why a cuckoo filter next to the Bloom (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14 — public paper):
- **deletion** (`remove`): a Bloom bit can never be cleared; a cuckoo
  fingerprint can, so re-crawl policies that retire URLs from the seen set
  (expired TTL, robots flip) work without rebuilding the filter;
- lower FPR per bit at the same size: 16-bit fingerprints in 4-way buckets
  give FPR ≈ 2·4/2^16 ≈ 1.2e-4 at high load vs the Bloom's 1% target;
- probe reads exactly 2 cache lines (two 4-slot buckets), not k scattered
  bits.

Same scale shape as the Bloom: key hashing stays JVM-side (two xxhash64
columns inside whole-stage codegen); Python sees only int64 pairs; each
cogrouped task touches exactly one bucket's uint16 table. Inserts are
batch-vectorized (two-choice fill drains in ≤ ~16 numpy passes — scalar
code only runs for the tiny eviction residue at high load, which lands in
a bounded stash on failure, preserving the NO-FALSE-NEGATIVES contract
unconditionally). Blob bytes are deterministic: incoming keys are deduped
and sorted before insertion, so partition order never changes the table.

Semantics contract (mirrors bloom.py): probe False ⇒ key definitely never
added (no false negatives); True ⇒ added OR a ~fpr false positive —
callers resolve those with the exact anti-join, so crawl results stay
exact. `remove` requires the key to have been added (classic cuckoo
deletion contract; removing a never-added key could evict a colliding
fingerprint and break the no-false-negative guarantee for its owner).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .sidetable import VersionedSideTable

CUCKOO_SCHEMA = T.StructType([
    T.StructField("host_bucket", T.IntegerType()),
    T.StructField("table", T.BinaryType()),    # uint16[n_slots * SLOT_W]
    T.StructField("n_slots", T.LongType()),
    T.StructField("stash", T.BinaryType()),    # uint64[] of (slot<<16 | fp)
    T.StructField("n_items", T.LongType()),
    T.StructField("fpr", T.DoubleType()),
])

SLOT_W = 4              # fingerprints per bucket slot (4-way association)
_FP_SEED = 0x9E3779B9   # same alt-seed family as bloom.py
_MAX_KICKS = 500
_FILL_LOAD = 0.84       # sizing target: slots * SLOT_W * load >= capacity


def _hash_cols(url_col: str):
    return (F.xxhash64(F.col(url_col)).alias("__h1"),
            F.xxhash64(F.col(url_col), F.lit(_FP_SEED)).alias("__h2"))


def _n_slots_for(capacity: int) -> int:
    need = max(8, int(np.ceil(capacity / (SLOT_W * _FILL_LOAD))))
    return 1 << int(np.ceil(np.log2(need)))


def _fp_of(h2: np.ndarray) -> np.ndarray:
    """16-bit fingerprint in [1, 65535] (0 marks an empty slot)."""
    return (h2 % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _alt_index(idx: np.ndarray, fp: np.ndarray, n_slots: int) -> np.ndarray:
    """Partner bucket: i ^ H(fp), in-range because n_slots is a power of
    two. H is an odd-multiplier mix so partners spread over the table."""
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) \
        & np.uint64(n_slots - 1)
    return (idx ^ mix).astype(np.uint64)


def _indices(h1: pd.Series, h2: pd.Series, n_slots: int):
    """(fp, i1, i2) arrays for a key batch; all derivable from the two
    JVM-side hashes."""
    a = h1.to_numpy(dtype=np.int64).view(np.uint64)
    b = h2.to_numpy(dtype=np.int64).view(np.uint64)
    fp = _fp_of(b)
    i1 = a & np.uint64(n_slots - 1)
    return fp, i1, _alt_index(i1, fp, n_slots)


def _contains(table: np.ndarray, stash: np.ndarray, fp, i1, i2) -> np.ndarray:
    """Vectorized membership: fp present in either bucket or the stash."""
    hit = (table[i1] == fp[:, None]).any(axis=1) \
        | (table[i2] == fp[:, None]).any(axis=1)
    for packed in stash:            # stash is tiny (eviction failures only)
        s_slot = np.uint64(packed) >> np.uint64(16)
        s_fp = np.uint16(np.uint64(packed) & np.uint64(0xFFFF))
        hit |= (fp == s_fp) & ((i1 == s_slot) | (i2 == s_slot))
    return hit


def _batch_fill(table: np.ndarray, fp: np.ndarray, tgt: np.ndarray
                ) -> np.ndarray:
    """Place each key's fingerprint in an empty slot of its target bucket,
    at most one key per bucket per pass (no write conflicts). Returns the
    boolean mask of keys placed. Drains in ≤ SLOT_W passes per distinct
    bucket batch — numpy throughout."""
    placed = np.zeros(len(fp), dtype=bool)
    pending = np.arange(len(fp))
    while len(pending):
        # first pending key per unique target bucket this pass
        _, first = np.unique(tgt[pending], return_index=True)
        pick = pending[first]
        rows = table[tgt[pick]]
        slot = (rows == 0).argmax(axis=1)       # leftmost empty slot
        ok = rows[np.arange(len(pick)), slot] == 0
        if not ok.any():
            break
        table[tgt[pick[ok]], slot[ok]] = fp[pick[ok]]
        placed[pick[ok]] = True
        keep = np.ones(len(pending), dtype=bool)
        keep[first] = False                      # picked keys leave the pool
        pending = pending[keep]
        # keys whose bucket just proved full also leave (their pass failed)
        pending = pending[~np.isin(tgt[pending], tgt[pick[~ok]])] \
            if (~ok).any() else pending
    return placed


def _insert_batch(table: np.ndarray, stash: list, fp: np.ndarray,
                  i1: np.ndarray, i2: np.ndarray, n_slots: int) -> None:
    """Insert all keys (already deduped, already absence-checked): batch
    two-choice fill, then a scalar cuckoo eviction walk for the residue,
    stash on walk failure. Deterministic: victim slot cycles with the kick
    count, keys arrive in sorted order."""
    placed = _batch_fill(table, fp, i1)
    rest = ~placed
    if rest.any():
        placed2 = _batch_fill(table, fp[rest], i2[rest])
        rem = np.flatnonzero(rest)[~placed2]
    else:
        rem = np.empty(0, dtype=np.int64)
    for j in rem:                                # tiny at sane load factors
        cur_fp = np.uint16(fp[j])
        cur_idx = np.uint64(i1[j])
        done = False
        for kick in range(_MAX_KICKS):
            row = table[cur_idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                table[cur_idx, empty[0]] = cur_fp
                done = True
                break
            victim_slot = kick % SLOT_W
            victim_fp = row[victim_slot]
            table[cur_idx, victim_slot] = cur_fp
            cur_fp = victim_fp
            cur_idx = _alt_index(np.uint64(cur_idx), np.uint16(cur_fp),
                                 n_slots)
        if not done:
            # bounded stash keeps the no-false-negative contract even on a
            # pathologically full table
            stash.append(int((np.uint64(cur_idx) << np.uint64(16))
                             | np.uint64(cur_fp)))


def _analytic_fpr(n_items: int, n_slots: int) -> float:
    load = n_items / float(n_slots * SLOT_W)
    return float(2 * SLOT_W * min(load, 1.0) / 65535.0)


def _delete_batch(table: np.ndarray, stash: list, fp, i1, i2) -> int:
    """Clear ONE matching fingerprint per key (i1 bucket first, then i2,
    then the stash). Scalar — deletion is a rare administrative op."""
    removed = 0
    for k in range(len(fp)):
        hit = False
        for idx in (i1[k], i2[k]):
            slots = np.flatnonzero(table[idx] == fp[k])
            if len(slots):
                table[idx, slots[0]] = 0
                hit = True
                break
        if not hit:
            for si, packed in enumerate(stash):
                s_slot = packed >> 16
                s_fp = packed & 0xFFFF
                if s_fp == fp[k] and s_slot in (int(i1[k]), int(i2[k])):
                    stash.pop(si)
                    hit = True
                    break
        removed += int(hit)
    return removed


class CuckooSideTable(VersionedSideTable):
    """Persisted, partitioned cuckoo filter keyed by host_bucket —
    interface-identical to BloomSideTable plus :meth:`remove`."""

    SCHEMA = CUCKOO_SCHEMA

    def __init__(self, path: str, spark: SparkSession,
                 capacity_per_bucket: int = 100_000,
                 keep_versions: int = 2, compact_after: int = 8):
        super().__init__(path, spark, keep_versions=keep_versions,
                         compact_after=compact_after)
        self.capacity = capacity_per_bucket
        self.n_slots = _n_slots_for(capacity_per_bucket)

    # ------------------------------------------------------------ add/remove
    def _apply(self, df: DataFrame, url_col: str, bucket_col: str,
               deleting: bool) -> None:
        n_slots_new = self.n_slots
        keys = df.select(F.col(bucket_col).cast("int").alias("host_bucket"),
                         *_hash_cols(url_col))
        touched = sorted(int(r[0]) for r in
                         keys.select("host_bucket").distinct().collect())
        if not touched:
            return
        base, compact = self._delta_plan(touched)

        def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left):
                row = left.iloc[0]
                n_slots = int(row["n_slots"])
                table = np.frombuffer(row["table"], dtype=np.uint16) \
                    .reshape(n_slots, SLOT_W).copy()
                stash = list(np.frombuffer(row["stash"], dtype=np.uint64)
                             .astype(object)) if len(row["stash"]) else []
                stash = [int(s) for s in stash]
                n, bucket = int(row["n_items"]), int(row["host_bucket"])
            else:
                n_slots = n_slots_new
                table = np.zeros((n_slots, SLOT_W), dtype=np.uint16)
                stash, n = [], 0
                bucket = int(right["host_bucket"].iloc[0])
            if len(right):
                # dedupe + sort so the blob is independent of arrow batch
                # order (cuckoo state, unlike a Bloom OR, is order-sensitive)
                right = right.drop_duplicates(subset=["__h1", "__h2"]) \
                             .sort_values(["__h1", "__h2"])
                fp, i1, i2 = _indices(right["__h1"], right["__h2"], n_slots)
                present = _contains(table, stash, fp, i1, i2)
                if deleting:
                    n -= _delete_batch(table, stash, fp[present], i1[present],
                                       i2[present])
                else:
                    fresh = ~present
                    _insert_batch(table, stash, fp[fresh], i1[fresh],
                                  i2[fresh], n_slots)
                    n += int(fresh.sum())
            return pd.DataFrame([{
                "host_bucket": bucket, "table": table.tobytes(),
                "n_slots": n_slots,
                "stash": np.array(stash, dtype=np.uint64).tobytes(),
                "n_items": n, "fpr": _analytic_fpr(n, n_slots)}])

        merged = (base.groupBy("host_bucket")
                  .cogroup(keys.groupBy("host_bucket"))
                  .applyInPandas(merge, CUCKOO_SCHEMA))
        self._commit_delta(merged, touched, compact)

    def add(self, df: DataFrame, url_col: str = "url",
            bucket_col: str = "host_bucket") -> None:
        """Insert the keys of ``df``; commits a new side-table version.
        Idempotent: keys already present are skipped (so re-adding after a
        resume is harmless and ``n_items`` counts distinct keys)."""
        self._apply(df, url_col, bucket_col, deleting=False)

    def remove(self, df: DataFrame, url_col: str = "url",
               bucket_col: str = "host_bucket") -> None:
        """Delete previously-added keys (the Bloom can't do this). Keys in
        ``df`` that were never added are ignored (their absence is detected
        before any slot is touched, so no other key's membership can be
        damaged — stricter than the classic contract)."""
        self._apply(df, url_col, bucket_col, deleting=True)

    # --------------------------------------------------------------- probe
    def probe(self, df: DataFrame, url_col: str = "url",
              bucket_col: str = "host_bucket",
              out_col: str = "__maybe_seen") -> DataFrame:
        """Return ``df`` + boolean ``out_col``. False ⇒ key definitely never
        added (no false negatives); True ⇒ added OR a ~fpr false positive —
        resolve those with the exact anti-join."""
        cur = self.filters()
        if cur is None:
            return df.withColumn(out_col, F.lit(False))
        in_cols = df.columns
        probe_in = df.withColumn("__h1", F.xxhash64(F.col(url_col))) \
                     .withColumn("__h2", F.xxhash64(F.col(url_col),
                                                    F.lit(_FP_SEED)))
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
                n_slots = int(row["n_slots"])
                table = np.frombuffer(row["table"], dtype=np.uint16) \
                    .reshape(n_slots, SLOT_W)
                stash = [int(s) for s in
                         np.frombuffer(row["stash"], dtype=np.uint64)]
                fp, i1, i2 = _indices(left["__h1"], left["__h2"], n_slots)
                res = _contains(table, stash, fp, i1, i2)
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
