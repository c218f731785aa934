"""Versioned, partitioned parquet side table — shared persistence for the
URL-seen filter family (bloom.py, cuckoo.py).

One row per ``host_bucket`` (the same ``xxhash64(host) % B`` salt the
frontier is partitioned by), persisted Iceberg-style: every delta write
lands in a NEW ``v{N}`` directory holding only the buckets it touched plus
a ``_MANIFEST.json`` mapping every live bucket to the version dir that
holds its current blob; a ``CURRENT`` pointer file is fsync'd and atomically
replaced last, so a killed job resumes against the last committed filter
generation (the analog of an Iceberg snapshot of the side table).

Write amplification is bounded two ways:
- deltas rewrite only touched buckets (a wave touching 5% of hosts writes
  5% of the table);
- once a generation references more than ``compact_after`` distinct dirs,
  the next write compacts the whole table into one dir (bounds read
  fan-in; amortizes full rewrites).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


class VersionedSideTable:
    """Base: versioned per-bucket blob storage. Subclasses set ``SCHEMA``
    (must contain an int ``host_bucket`` column) and implement their own
    ``add``/``probe`` on top of :meth:`filters` + :meth:`_commit_delta`."""

    SCHEMA = None  # subclass responsibility

    def __init__(self, path: str, spark: SparkSession,
                 keep_versions: int = 2, compact_after: int = 8):
        self.path = path
        self.spark = spark
        self.keep_versions = keep_versions
        self.compact_after = compact_after
        os.makedirs(path, exist_ok=True)

    # ----------------------------------------------------------- versioning
    def _current_path(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def version(self) -> int:
        cp = self._current_path()
        if not os.path.exists(cp):
            return -1
        with open(cp) as f:
            return int(f.read().strip())

    def _flip(self, version: int) -> None:
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current_path())
        # prune generations no longer referenced by the current manifest
        # (delta versions stay live until compaction rewrites their buckets)
        live = {version} | set(self._manifest(version).values())
        floor = version - self.keep_versions
        for d in os.listdir(self.path):
            if d.startswith("v") and d[1:].isdigit():
                v = int(d[1:])
                if v > version or (v not in live and v <= floor):
                    shutil.rmtree(os.path.join(self.path, d),
                                  ignore_errors=True)

    def _manifest(self, version: int) -> dict:
        """bucket (int) -> version (int) whose dir holds its current blob."""
        mp = os.path.join(self.path, f"v{version}", "_MANIFEST.json")
        if not os.path.exists(mp):
            return {}
        with open(mp) as f:
            return {int(b): int(v) for b, v in json.load(f).items()}

    def filters(self) -> Optional[DataFrame]:
        v = self.version()
        if v < 0:
            return None
        manifest = self._manifest(v)
        if not manifest:
            # legacy full-table layout (no manifest): the whole generation
            # lives in the current version dir
            return self.spark.read.schema(self.SCHEMA).parquet(
                os.path.join(self.path, f"v{v}"))
        by_ver: dict = {}
        for bucket, bv in manifest.items():
            by_ver.setdefault(bv, []).append(bucket)
        parts = []
        for bv, buckets in sorted(by_ver.items()):
            parts.append(self.spark.read.schema(self.SCHEMA)
                         .parquet(os.path.join(self.path, f"v{bv}"))
                         .filter(F.col("host_bucket").isin(buckets)))
        if not parts:
            return self.spark.createDataFrame([], self.SCHEMA)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ------------------------------------------------------------ delta add
    def _delta_plan(self, touched):
        """(base_df, compact) for a delta write touching ``touched`` buckets:
        the rows the merge must read, and whether this write compacts the
        whole table into one dir."""
        cur = self.filters()
        if cur is None:
            cur = self.spark.createDataFrame([], self.SCHEMA)
        prev_v = self.version()
        prev_manifest = self._manifest(prev_v) if prev_v >= 0 else {}
        compact = len(set(prev_manifest.values())) >= self.compact_after \
            or (prev_v >= 0 and not prev_manifest)  # legacy layout: rewrite
        base = cur if compact else \
            cur.filter(F.col("host_bucket").isin(list(touched)))
        return base, compact

    def _commit_delta(self, merged: DataFrame, touched, compact: bool) -> None:
        """Write ``merged`` (the new blobs) as the next version dir, extend
        or rebuild the manifest, flip CURRENT."""
        prev_v = self.version()
        prev_manifest = self._manifest(prev_v) if prev_v >= 0 else {}
        v = prev_v + 1
        out = os.path.join(self.path, f"v{v}")
        if os.path.exists(out):
            shutil.rmtree(out)
        merged.write.parquet(out)
        if compact:
            # manifest = exactly the buckets written (covers the legacy
            # no-manifest layout, where prev_manifest is empty but the
            # current generation holds every bucket)
            written = self.spark.read.schema(self.SCHEMA).parquet(out) \
                .select("host_bucket").distinct().collect()
            manifest = {int(r[0]): v for r in written}
        else:
            manifest = dict(prev_manifest)
            manifest.update({b: v for b in touched})
        with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
            json.dump({str(b): bv for b, bv in manifest.items()}, f)
        self._flip(v)
