"""input_hint corpus + extractor byte-identity goldens.

The north-rule per-row invariant: extracted text per URL is byte-identical
to the reference extractor's output — here the corpus carries the ground
truth in its ``text`` column (generated through the same documented
decodeBuffer semantics), so identity must hold for EVERY row, across both
charsets the corpus mixes (utf-8 / iso-8859-1 with meta declarations)."""

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.operators.extract import extract_text
from simplecrawler_spark.plans.crawl import WaveCrawler
from simplecrawler_spark.sources.ccpages import (cc_to_crawl_pages,
                                                 synth_cc_pages)


def test_extract_byte_identity_all_rows(spark):
    cc = synth_cc_pages(spark, 2_000, 40).cache()
    got = extract_text(cc)
    joined = cc.join(got, "url")
    assert joined.count() == 2_000
    mismatch = joined.filter(
        (F.col("extracted_text") != F.col("text")) |
        F.col("extracted_text").isNull()).count()
    assert mismatch == 0
    # non-ascii actually exercised (é/ü/ñ bytes differ across the charsets)
    assert joined.filter(F.col("text").rlike("[^\\x00-\\x7f]")).count() > 0
    cc.unpersist()


def test_synth_is_deterministic_across_parallelism(spark):
    a = synth_cc_pages(spark, 500, 10)
    b = synth_cc_pages(spark, 500, 10).repartition(13)
    ha = a.select(F.sha2(F.concat_ws("|", "url", F.hex("html"), "text",
                                     "lang"), 256).alias("h"))
    hb = b.select(F.sha2(F.concat_ws("|", "url", F.hex("html"), "text",
                                     "lang"), 256).alias("h"))
    assert ha.exceptAll(hb).count() == 0 and hb.exceptAll(ha).count() == 0


def test_gzip_and_header_charset_paths(spark):
    import gzip as gz
    rows = [
        ("http://a.test/gz", bytearray(gz.compress("héllo".encode("utf-8"))),
         "text/html; charset=utf-8", "gzip"),
        ("http://a.test/bad", bytearray(b"\x1f\x8b broken"), "text/html",
         "gzip"),
        ("http://a.test/hdr", bytearray("héllo".encode("cp1252")),
         "text/html; charset=windows-1252", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, html binary, content_type string, "
              "content_encoding string")
    out = {r["url"]: r for r in extract_text(
        df, content_type_col="content_type",
        content_encoding_col="content_encoding").collect()}
    assert out["http://a.test/gz"]["extracted_text"] == "héllo"
    assert out["http://a.test/bad"]["extract_error"] == "gziperror"
    assert out["http://a.test/hdr"]["extracted_text"] == "héllo"


def test_crawler_runs_over_cc_corpus(spark):
    cc = synth_cc_pages(spark, 300, 6, links_per_page=3)
    pages = cc_to_crawl_pages(cc).cache()
    pages.count()
    seed = cc.select("url").first()["url"]
    cfg = CrawlerConfig(initial_url=seed, filter_by_domain=False,
                        respect_robots_txt=False, max_depth=3,
                        tokens_per_host_per_wave=64, id_mode="composite",
                        record_fetch_log=False, max_waves=4)
    c = WaveCrawler(spark, pages, cfg, keep_content=False)
    c.run()
    fetched = c.frontier.filter("fetched").count()
    assert fetched > 1  # links were discovered and followed
    # every fetched URL exists in the corpus (no synthesis drift)
    assert c.frontier.filter("fetched").join(
        pages.select("url"), "url", "left_anti").count() == 0
    pages.unpersist()
