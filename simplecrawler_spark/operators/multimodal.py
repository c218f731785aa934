"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
kernels. Decode is format-sniffed per payload (magic bytes —
functions/imagemeta.py) and honestly reported per format:

- PNGs in the stdlib-decodable subset (8-bit grey/RGB/greyA/RGBA,
  non-interlaced) get a REAL decode via functions/png.py (zlib + struct):
  decoded=True plus true width/height/mean_pixel.
- GIF87a/GIF89a get a REAL decode via functions/gif.py (pure-stdlib LZW,
  first frame, interlace-aware): decoded=True plus true dimensions and
  palette-mapped mean pixel.
- JPEG payloads report ``format='jpeg'`` and the TRUE frame dimensions
  parsed from the SOF marker segment (header walk, no pixel decode —
  baseline DCT needs a codec this container lacks): decoded=False,
  width/height real, mean_pixel NULL.
- WebP/BMP/TIFF/unknown report their sniffed format with decoded=False
  and NULL real fields — the classifier makes the missing-codec boundary
  explicit instead of silently absorbing these into the fake features;
  ``decode_image`` without the fake flag raises NotImplementedError for
  them.

Every row also carries the deterministic content-derived fake features
(octet_length / md5 prefixes), intentionally SQL-expressible so the
driver's DuckDB oracle can check the pipeline end-to-end; the oracle
corpus prepends ASCII GIF magic to a doc_id slice so the classifier
column is exercised under the oracle too.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.gif import decode_gif
from ..functions.imagemeta import jpeg_dimensions, sniff_format
from ..functions.png import decode_png

FEATURE_SCHEMA = ("doc_id long, n_bytes long, payload_hash string, "
                  "format string, "
                  "fake_width int, fake_height int, fake_mean double, "
                  "decoded boolean, width int, height int, "
                  "mean_pixel double")


def attach_payload(documents: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'image' payload per document (the
    testdata corpus has no real media; payload = utf-8 bytes of text).
    A doc_id slice gets an ASCII GIF magic prefix so the format classifier
    has non-'unknown' rows to classify under the SQL oracle (the bytes are
    not a valid GIF body, so real decode correctly declines them)."""
    prefixed = (F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.lit("GIF89a"), F.col("text")))
                .when(F.col("doc_id") % 5 == 1,
                      F.concat(F.lit("GIF87a"), F.col("text")))
                .otherwise(F.col("text")))
    return documents.select(
        "doc_id",
        F.encode(prefixed, "utf-8").alias("payload"),
        F.struct(F.when(F.col("doc_id") % 5 < 2, F.lit("image/gif"))
                 .otherwise(F.lit("application/octet-stream")).alias("mime"),
                 F.length(F.col("text")).alias("source_len")).alias("meta"))


def decode_image(payload: bytes, fake: str = None):
    """Format-sniffed decode. PNG and GIF decode for REAL (stdlib); JPEG
    yields true header dimensions without pixels; other formats need an
    imaging library this container lacks — the deterministic fake derives
    pseudo-dimensions and a mean 'pixel' value from the payload hash so
    downstream plumbing stays testable (decoded=False, real fields
    NULL)."""
    h = hashlib.md5(payload).hexdigest()
    n = len(payload)
    fmt = sniff_format(payload)
    feats = {
        "n_bytes": n,
        "payload_hash": h,
        "format": fmt,
        "fake_width": (n % 64) + 1,
        "fake_height": (int(h[:2], 16) % 64) + 1,
        "fake_mean": int(h[2:6], 16) / 65535.0,
        "decoded": False, "width": None, "height": None, "mean_pixel": None,
    }
    if fmt == "png":
        try:
            png = decode_png(payload)
        except Exception:  # PNG outside the stdlib subset → fake fallback
            png = None
        if png is not None:
            feats.update(decoded=True, width=png["width"],
                         height=png["height"], mean_pixel=png["mean"])
            return feats
    elif fmt == "gif":
        try:
            gif = decode_gif(payload)
        except Exception:  # malformed / truncated body → fake fallback
            gif = None
        if gif is not None:
            feats.update(decoded=True, width=gif["width"],
                         height=gif["height"], mean_pixel=gif["mean"])
            return feats
    elif fmt == "jpeg":
        dims = jpeg_dimensions(payload)
        if dims is not None:
            # real header metadata, honestly not a pixel decode
            feats.update(width=dims[0], height=dims[1])
    if fake != "deterministic":
        raise NotImplementedError(
            f"{fmt} pixel decode requires an imaging library not available "
            "here; pass fake='deterministic' for the plumbing-test path")
    return feats


_FEATURE_KEYS = ("n_bytes", "payload_hash", "format",
                 "fake_width", "fake_height",
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
