"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
kernels. Decode is feature-probed per payload:

- PNGs in the stdlib-decodable subset (8-bit grey/RGB/greyA/RGBA,
  non-interlaced) get a REAL decode via functions/png.py (zlib + struct —
  no imaging library exists in this container): decoded=True plus true
  width/height/mean_pixel.
- Everything else falls back to the deterministic content-derived fake
  (decoded=False, width/height/mean_pixel NULL), which exercises the full
  Spark plumbing (schema, batching, partitioning) without a codec;
  ``decode_image`` without the fake flag raises NotImplementedError for
  non-PNG payloads, honestly marking the missing-codec boundary.

The fake features are intentionally SQL-expressible (octet_length / md5
prefixes) so the driver's DuckDB oracle can check the pipeline end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.png import decode_png

FEATURE_SCHEMA = ("doc_id long, n_bytes long, payload_hash string, "
                  "fake_width int, fake_height int, fake_mean double, "
                  "decoded boolean, width int, height int, "
                  "mean_pixel double")


def attach_payload(documents: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'image' payload per document (the
    testdata corpus has no real media; payload = utf-8 bytes of text)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(F.lit("image/fake").alias("mime"),
                 F.length(F.col("text")).alias("source_len")).alias("meta"))


def decode_image(payload: bytes, fake: str = None):
    """Feature-probed decode. PNGs in the stdlib subset decode for REAL
    (functions/png.py); other formats need an imaging library this
    container lacks — the deterministic fake derives pseudo-dimensions and
    a mean 'pixel' value from the payload hash so downstream plumbing stays
    testable (decoded=False, real fields NULL)."""
    h = hashlib.md5(payload).hexdigest()
    n = len(payload)
    feats = {
        "n_bytes": n,
        "payload_hash": h,
        "fake_width": (n % 64) + 1,
        "fake_height": (int(h[:2], 16) % 64) + 1,
        "fake_mean": int(h[2:6], 16) / 65535.0,
        "decoded": False, "width": None, "height": None, "mean_pixel": None,
    }
    try:
        png = decode_png(payload)
    except Exception:  # PNG outside the stdlib subset → fake fallback
        png = None
    if png is not None:
        feats.update(decoded=True, width=png["width"], height=png["height"],
                     mean_pixel=png["mean"])
        return feats
    if fake != "deterministic":
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library not available "
            "here; pass fake='deterministic' for the plumbing-test path")
    return feats


_FEATURE_KEYS = ("n_bytes", "payload_hash", "fake_width", "fake_height",
                 "fake_mean", "decoded", "width", "height", "mean_pixel")


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → FEATURE_SCHEMA rows."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id",) + _FEATURE_KEYS}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            feats = decode_image(bytes(payload), fake="deterministic")
            out["doc_id"].append(doc_id)
            for k in _FEATURE_KEYS:
                out[k].append(feats[k])
        yield pd.DataFrame(out)


def image_features(documents: DataFrame) -> DataFrame:
    """Full pipeline: attach payload → Arrow-batched feature extraction."""
    return (attach_payload(documents)
            .select("doc_id", "payload")
            .mapInPandas(extract_features, FEATURE_SCHEMA))
