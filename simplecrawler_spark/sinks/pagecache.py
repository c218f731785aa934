"""FS page-cache sink — website-mirror layout (S6/S7).

Parity targets (behavior, re-expressed for Spark):
- sanitise_path ⇔ /root/reference/src/cache-backend-fs.ts:20-69
  (leading-slash strip, trailing-whitespace trim, empty → index.html,
  querystring → sha1 hex, ≥250-char segments → sha1 hex, extension
  inference from content-type: text/html → .html / index.html,
  image|video|audio|application → subtype suffix)
- setItem layout  ⇔ cache-backend-fs.ts:142-207: file at
  <location>/<protocol>/<host>/<port>/<sanitised...>, a
  ``.cacheData.json`` metadata sidecar per file, and a ``cacheindex.json``
  (url, etag, lastModified, dataFile, metaFile) index.

At scale the cache is the ``fetched_pages`` table itself (url-keyed joins,
S7); this sink exists for mirror-to-filesystem parity. ``cache_paths``
computes the layout distributed (one Arrow pass); ``write_fs_cache``
materializes files from executors via foreachPartition (local FS or a
shared mount) and builds the index from the returned rows driver-side.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

_EXT_RE = re.compile(r"\.[a-z0-9]{1,6}$", re.I)
_HTML_EXT_RE = re.compile(r"\.htm[l]?$", re.I)
_MIME_SUB_RE = re.compile(r"(image|video|audio|application)/([a-z0-9]+)", re.I)


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def sanitise_path(path: str, content_type: Optional[str] = None) -> str:
    """File-system friendly path for one resource (reference semantics)."""
    path = re.sub(r"^/", "", path or "")
    sanitised = re.sub(r"\s*$", "", path) if len(path) else "index.html"

    if "?" in sanitised:
        resource, _, qs = sanitised.partition("?")
        sanitised = resource + "?" + _sha1(qs)

    sanitised = "/".join(
        _sha1(chunk) if len(chunk) >= 250 else chunk
        for chunk in sanitised.split("/"))

    ct = content_type or ""
    is_html = bool(re.search(r"text/html", ct, re.I))
    if not _EXT_RE.search(sanitised) or (is_html and
                                         not _HTML_EXT_RE.search(sanitised)):
        if is_html:
            sanitised += "index.html" if sanitised.endswith("/") else ".html"
        else:
            m = _MIME_SUB_RE.search(ct)
            if m:
                sanitised += "." + m.group(2)
    return sanitised


CACHE_PATH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("cache_path", T.StringType()),
])


def cache_paths(df: DataFrame) -> DataFrame:
    """(url, cache_path) for rows carrying (url, protocol, host, port, path
    [, state.content_type]) — the mirror layout, computed distributed."""
    has_state = "state" in df.columns
    cols = ["url", "protocol", "host", "port", "path"]
    pruned = df.select(*cols, *([F.col("state.content_type")
                                 .alias("__ct")] if has_state else
                                [F.lit(None).cast("string").alias("__ct")]))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            paths = [
                "/".join([str(proto), str(host), str(port)] +
                         sanitise_path(p, ct).split("/"))
                for proto, host, port, p, ct in zip(
                    b["protocol"], b["host"], b["port"], b["path"], b["__ct"])]
            yield pd.DataFrame({"url": b["url"], "cache_path": paths})

    return pruned.mapInPandas(run, CACHE_PATH_SCHEMA)


def write_fs_cache(content: DataFrame, frontier: DataFrame,
                   location: str) -> int:
    """Mirror fetched bodies to ``location`` (setItem layout + sidecars +
    cacheindex.json). Executors write data files; the driver writes the
    index. Returns the number of files written."""
    os.makedirs(location, exist_ok=True)
    meta = frontier.select("url", "protocol", "host", "port", "path",
                           "state")
    rows = (content.select("url", "body")
            .join(meta, "url")
            .join(cache_paths(meta), "url"))

    def persist(part: Iterator) -> Iterator:
        for r in part:
            full = os.path.join(location, r["cache_path"])
            os.makedirs(os.path.dirname(full), exist_ok=True)
            with open(full, "wb") as f:
                f.write(bytes(r["body"]) if r["body"] is not None else b"")
            sidecar = {"url": r["url"], "protocol": r["protocol"],
                       "host": r["host"], "port": r["port"],
                       "path": r["path"]}
            with open(full + ".cacheData.json", "w") as f:
                json.dump(sidecar, f)
            state = r["state"].asDict() if r["state"] is not None else {}
            headers = state.get("headers") or {}
            yield {"url": r["url"], "etag": headers.get("etag"),
                   "lastModified": headers.get("last-modified"),
                   "dataFile": full, "metaFile": full + ".cacheData.json"}

    index = list(rows.rdd.mapPartitions(persist).collect())
    with open(os.path.join(location, "cacheindex.json"), "w") as f:
        json.dump(index, f)
    return len(index)


def read_fs_cache(spark, location: str) -> DataFrame:
    """S7: the cache index as a DataFrame (url-keyed lookups = joins)."""
    with open(os.path.join(location, "cacheindex.json")) as f:
        index = json.load(f)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("lastModified", T.StringType()),
        T.StructField("dataFile", T.StringType()),
        T.StructField("metaFile", T.StringType()),
    ])
    return spark.createDataFrame(index, schema)
