"""Frontier / candidate / lineage schemas (SURVEY.md §1.3).

The frontier is the distributed analog of the reference's FetchQueue array
(/root/reference/src/queue.ts:79): one row per known URL, columnar, keyed by
a monotone enqueue id whose ordering IS the reference's FIFO fetch order.
"""

from __future__ import annotations

from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("request_latency", T.LongType()),
    T.StructField("request_time", T.LongType()),
    T.StructField("download_time", T.LongType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("code", T.IntegerType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    T.StructField("actual_data_size", T.LongType()),
    T.StructField("sent_incorrect_size", T.BooleanType()),
])

FRONTIER_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("protocol", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("port", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("uri_path", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("referrer", T.StringType()),
    T.StructField("fetched", T.BooleanType()),
    T.StructField("status", T.StringType()),
    T.StructField("wave", T.IntegerType()),
    T.StructField("host_bucket", T.IntegerType()),
    T.StructField("is_seed_chain", T.BooleanType()),
    T.StructField("state", STATE_SCHEMA),
])

# raw candidate URLs entering the enqueue pipeline (D4/R1/S3 outputs)
CANDIDATE_SCHEMA = T.StructType([
    T.StructField("raw_url", T.StringType()),
    T.StructField("referrer_id", T.LongType()),
    T.StructField("pos", T.LongType()),
    T.StructField("referrer_url", T.StringType()),
    T.StructField("referrer_depth", T.IntegerType()),
    T.StructField("is_seed_chain", T.BooleanType()),
    T.StructField("skip_depth_gate", T.BooleanType()),
    # collapsed-duplicate multiplicity from the pre-canonicalization dedupe
    # (event counters weight by it); 1 for non-deduped candidate sources
    T.StructField("weight", T.LongType()),
    # full referrer QueueItem as JSON (crawler.ts:1502-1523 passes the
    # referrer item to fetch conditions); populated only when
    # config.fetch_conditions is non-empty, else null (zero cost)
    T.StructField("referrer_item", T.StringType()),
])

# canonicalized candidates (after the process_url/filter Arrow pass)
PROCESSED_CANDIDATE_SCHEMA = T.StructType(
    CANDIDATE_SCHEMA.fields + [
        T.StructField("url", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("port", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("uri_path", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("reject_reason", T.StringType()),
    ])

# body-processing output (unzip → decode → discover, one Arrow pass)
BODY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("body", T.BinaryType()),       # emitted body (decompress flag applied)
    T.StructField("text", T.StringType()),       # decoded text (decode_responses)
    T.StructField("extracted_text", T.StringType()),  # always-decoded text (input_hint column)
    T.StructField("discovered", T.ArrayType(T.StringType())),
    T.StructField("gzip_error", T.BooleanType()),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("wave", T.IntegerType()),
    T.StructField("host_bucket", T.IntegerType()),
    T.StructField("url_count", T.LongType()),
    T.StructField("bloom_fpr", T.DoubleType()),
])

# robots_rules side table: one row per touched origin that has applicable
# rules and/or a Crawl-delay for the crawl's user agent. ``seq`` is the
# driver registration order (first-delay-wins tie-break across origins of a
# host); persisted as append-only parquet parts under the store so resume
# rebuilds verdicts + delay budgets without re-parsing any robots body.
ROBOTS_RULES_SCHEMA = ("protocol string, host string, port int, "
                       "rules_json string, crawl_delay double, seq long")
