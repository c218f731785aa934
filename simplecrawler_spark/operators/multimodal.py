"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
kernels. The decode step itself is STUBBED in this container (no PIL /
ffmpeg): ``decode_image`` raises NotImplementedError unless
``fake="deterministic"``, in which case a seeded, content-derived fake
"decode" exercises the full Spark plumbing (schema, batching, partitioning)
without the codec.

The deterministic fake features are intentionally SQL-expressible
(octet_length / md5 prefixes) so the driver's DuckDB oracle can check the
pipeline end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes long, payload_hash string, "
                  "fake_width int, fake_height int, fake_mean double")


def attach_payload(documents: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'image' payload per document (the
    testdata corpus has no real media; payload = utf-8 bytes of text)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(F.lit("image/fake").alias("mime"),
                 F.length(F.col("text")).alias("source_len")).alias("meta"))


def decode_image(payload: bytes, fake: str = None):
    """Decode stub — real decode needs an image library not present in this
    container. The deterministic fake derives pseudo-dimensions and a mean
    'pixel' value from the payload hash so downstream plumbing is testable.
    """
    if fake != "deterministic":
        raise NotImplementedError(
            "image decode requires an imaging library not available here; "
            "pass fake='deterministic' for the plumbing-test path")
    h = hashlib.md5(payload).hexdigest()
    n = len(payload)
    return {
        "n_bytes": n,
        "payload_hash": h,
        "fake_width": (n % 64) + 1,
        "fake_height": (int(h[:2], 16) % 64) + 1,
        "fake_mean": int(h[2:6], 16) / 65535.0,
    }


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → FEATURE_SCHEMA rows."""
    for pdf in batches:
        out = {"doc_id": [], "n_bytes": [], "payload_hash": [],
               "fake_width": [], "fake_height": [], "fake_mean": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            feats = decode_image(bytes(payload), fake="deterministic")
            out["doc_id"].append(doc_id)
            for k in ("n_bytes", "payload_hash", "fake_width", "fake_height",
                      "fake_mean"):
                out[k].append(feats[k])
        yield pd.DataFrame(out)


def image_features(documents: DataFrame) -> DataFrame:
    """Full pipeline: attach payload → Arrow-batched feature extraction."""
    return (attach_payload(documents)
            .select("doc_id", "payload")
            .mapInPandas(extract_features, FEATURE_SCHEMA))
