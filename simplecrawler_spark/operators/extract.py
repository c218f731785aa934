"""Text extraction over a CC-style corpus — the input_hint invariant.

``extract_text`` reproduces the reference extractor (decodeBuffer,
/root/reference/src/crawler.ts:1105-1112: charset from Content-Type header,
else <meta charset> in the first 512 bytes, else utf8; whole-document
decode with replacement) as one Arrow ``mapInPandas`` pass: html bytes in,
decoded text out, byte-identical per URL to the ``text`` column the corpus
carries. Gzip payloads (content_encoding='gzip') are inflated first, like
the fetch path (crawler.ts:1790-1802).

Columns are pruned to (url, html[, content_type, content_encoding]) before
the Python stage so Arrow only ships what the kernel reads.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.decode import decode_buffer, unzip

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("extracted_text", T.StringType()),
    T.StructField("extract_error", T.StringType()),
])


def extract_text(cc: DataFrame, url_col: str = "url", html_col: str = "html",
                 content_type_col: Optional[str] = None,
                 content_encoding_col: Optional[str] = None) -> DataFrame:
    """(url, extracted_text, extract_error) — reference-extractor semantics."""
    cols = [url_col, html_col]
    if content_type_col:
        cols.append(content_type_col)
    if content_encoding_col:
        cols.append(content_encoding_col)
    pruned = cc.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls = b[url_col]
            ctypes = b[content_type_col] if content_type_col else None
            cencs = b[content_encoding_col] if content_encoding_col else None
            texts, errs = [], []
            for i, raw in enumerate(b[html_col]):
                body = bytes(raw) if raw is not None else b""
                err = None
                enc = (cencs.iloc[i] or "") if cencs is not None else ""
                if "gzip" in enc or "deflate" in enc:
                    out, uerr = unzip(body)
                    if uerr:
                        err = "gziperror"
                    else:
                        body = out
                ct = (ctypes.iloc[i] or "") if ctypes is not None else ""
                texts.append(decode_buffer(body, ct) if err is None else None)
                errs.append(err)
            yield pd.DataFrame({"url": urls, "extracted_text": texts,
                                "extract_error": errs})

    return pruned.mapInPandas(run, EXTRACT_SCHEMA)
