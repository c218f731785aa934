"""Common-Crawl-style corpus (the BASELINE.json input_hint table).

Schema is exactly the input_hint shape:

    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

``synth_cc_pages`` builds it deterministically and fully distributed —
every column is a pure function of ``spark.range`` ids (no driver loops, no
randomness), so the same (n_pages, n_hosts) always yields byte-identical
parquet at any parallelism. ``text`` is the ground-truth extraction of
``html`` under the reference extractor semantics (decodeBuffer,
/root/reference/src/crawler.ts:1105-1112: whole-document decode via header >
meta-charset > utf8) — the per-row invariant `extract_text(html) == text`
is what the byte-identity tests and the sf-scale self-consistency check
assert.

Host popularity is power-law (host = floor(u^3 * n_hosts)) so the hottest
host carries ~10x the median load — the skew the politeness bucketing and
salted repartition must absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CC_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

# word pools per language — iso-8859-1-representable so both charsets can
# carry any of them (the é/ü/ñ bytes differ between the two encodings,
# which is exactly what the decode path must get right)
_LANGS = [
    ("en", ["the", "crawl", "frontier", "wave", "queue", "robots", "fetch"]),
    ("de", ["über", "während", "Grüße", "Straße", "Müller", "schön", "Bär"]),
    ("fr", ["déjà", "équipe", "être", "français", "créé", "où", "château"]),
    ("es", ["añade", "según", "través", "número", "así", "días", "señal"]),
]
_EPOCH = "2024-01-01 00:00:00"


def _u(col):  # uniform [0,1) hash of a column
    return (F.abs(F.xxhash64(col.cast("string"))) % 1_000_003) / 1_000_003.0


def host_of(idcol, n_hosts: int):
    """Power-law host assignment (u^3 concentrates mass on low host ids)."""
    return F.floor(F.pow(_u(idcol), 3.0) * n_hosts).cast("long")


def synth_cc_pages(spark: SparkSession, n_pages: int, n_hosts: int,
                   links_per_page: int = 6,
                   with_robots: bool = False) -> DataFrame:
    """Deterministic CC-style corpus; html ⟷ text consistent by construction.

    ``with_robots=True`` appends one robots.txt row per EVEN host id
    (User-agent: * / Disallow: /p/<host%10>) — odd hosts 404 their robots
    fetch, exercising the robotstxterror path; even hosts reject a slice of
    their pages, exercising the disallow path."""
    df = (spark.range(n_pages)
          .withColumn("host_id", host_of(F.col("id"), n_hosts))
          .withColumn("__lang_ix",
                      (F.abs(F.xxhash64(F.col("id") + 7)) % len(_LANGS))
                      .cast("int")))
    lang = F.element_at(
        F.array(*[F.lit(l) for l, _ in _LANGS]), F.col("__lang_ix") + 1)
    # a deterministic sentence: 12 words drawn from the page's language pool
    words = F.array(*[
        F.element_at(
            F.element_at(F.array(*[F.array(*[F.lit(w) for w in ws])
                                   for _, ws in _LANGS]),
                         F.col("__lang_ix") + 1),
            (F.abs(F.xxhash64(F.col("id") * 31 + k)) % 7 + 1).cast("int"))
        for k in range(12)])
    body = F.array_join(words, " ")
    links = [
        F.concat(F.lit('<a href="http://h'),
                 host_of((F.col("id") * 7 + k * 13 + 1) % n_pages,
                         n_hosts).cast("string"),
                 F.lit(".test/p/"),
                 ((F.col("id") * 7 + k * 13 + 1) % n_pages).cast("string"),
                 F.lit('">l</a>'))
        for k in range(links_per_page)]
    # even ids: utf-8; odd ids: iso-8859-1 — charset declared in <meta>, and
    # html bytes encoded accordingly. text == the decoded document string.
    charset = F.when(F.col("id") % 2 == 0, F.lit("utf-8")) \
               .otherwise(F.lit("iso-8859-1"))
    page = F.concat(
        F.lit('<html><head><meta charset="'), charset,
        F.lit('"></head><body><p>'), body, F.lit("</p>"),
        *links, F.lit("</body></html>"))
    html = F.when(F.col("id") % 2 == 0, F.encode(page, "UTF-8")) \
            .otherwise(F.encode(page, "ISO-8859-1"))
    out = df.select(
        F.concat(F.lit("http://h"), F.col("host_id").cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit(_EPOCH)) +
         F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        html.alias("html"),
        page.alias("text"),
        lang.alias("lang"))
    if with_robots:
        rbody = F.concat(F.lit("User-agent: *\nDisallow: /p/"),
                         (F.col("id") % 10).cast("string"), F.lit("\n"))
        robots = (spark.range(n_hosts).filter(F.col("id") % 2 == 0)
                  .select(
                      F.concat(F.lit("http://h"), F.col("id").cast("string"),
                               F.lit(".test/robots.txt")).alias("url"),
                      F.to_timestamp(F.lit(_EPOCH)).alias("warc_ts"),
                      F.encode(rbody, "UTF-8").alias("html"),
                      rbody.alias("text"),
                      F.lit("en").alias("lang")))
        out = out.unionByName(robots)
    return out


def cc_to_crawl_pages(cc: DataFrame) -> DataFrame:
    """Adapt the input_hint corpus to the crawler's pages-table shape, so a
    WaveCrawler runs directly over a CC snapshot (fetch = frontier ⨝ pages)."""
    return cc.select(
        "url",
        F.lit(200).alias("status"),
        "html",
        F.lit("text/html").alias("content_type"),
        F.lit(None).cast("string").alias("content_encoding"),
        F.length("html").cast("long").alias("content_length"),
        F.lit(None).cast("string").alias("location"),
        F.lit(None).cast("string").alias("set_cookie"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("last_modified"),
        F.lit(False).alias("hang"))
