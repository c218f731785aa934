"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (crawl-frontier
semantics) or a training-data pipeline op (dedup / similarity / text
analysis / multimodal), run over the driver's testdata tables; the matching
``oracle_sql()`` is the ANSI-SQL twin DuckDB executes on the same parquet.

Conventions for hash-stable comparisons:
- every computed column is aliased identically on both sides;
- integer-ish columns are BIGINT on both sides (Spark ints are cast);
- float outputs are either single-division results (bit-identical IEEE on
  both engines) or explicitly rounded; similarity ranks are compared
  instead of raw cosine values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from simplecrawler_spark.operators import textpipe as tp
from simplecrawler_spark.operators.multimodal import image_features
from simplecrawler_spark.operators.similarity import cosine_topk

# deterministic hyperplanes for the LSH ANN variant (±1 from md5 bits)
import hashlib


def _planes(n_planes: int = 4, dim: int = 64):
    planes = []
    for p in range(n_planes):
        h = hashlib.md5(f"plane:{p}".encode()).digest() * 4  # 64 bytes
        planes.append([1.0 if (h[i] & 1) else -1.0 for i in range(dim)])
    return planes


def _plane_sets(n_tables: int = 8, n_planes: int = 7, dim: int = 64):
    """L independent hyperplane tables for multi-table LSH (±1 from md5)."""
    sets = []
    for t in range(n_tables):
        planes = []
        for p in range(n_planes):
            h = hashlib.md5(f"tbl:{t}:plane:{p}".encode()).digest() * 4
            planes.append([1.0 if (h[i] & 1) else -1.0 for i in range(dim)])
        sets.append(planes)
    return sets


PLANES = _planes()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- crawl
def q_fifo_politeness(spark, sf_dir):
    """C1/Q5: FIFO due-selection with a per-host token budget (3/wave) over
    a frontier derived from the events table — runs the production
    skew-safe two-phase select_due operator; the oracle is the equivalent
    single-window SQL rank (two-phase top-k is exact)."""
    from simplecrawler_spark.operators.politeness import select_due
    frontier = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias("host"),
        F.lit("queued").alias("status"))
    # approx_rows gates the two-phase skew-safe rank to where it pays (the
    # wave engine passes its incrementally-tracked queued count; here one
    # cheap count does the same) — below the gate a single window ranks any
    # host in one task faster than the pre-rank's extra shuffle costs.
    due = select_due(frontier, tokens_per_host=3,
                     approx_rows=frontier.count())
    w = Window.partitionBy("host").orderBy("id")
    return (due.withColumn("rk", F.row_number().over(w).cast("long"))
            .select("id", "host", "rk"))


def q_fifo_crawl_delay(spark, sf_dir):
    """C1 nuance: per-host Crawl-delay budgets — hosts whose robots.txt
    asks for a larger delay get a SHRUNK token budget (broadcast side-table
    override in select_due; plans/crawl.py::_crawl_delay_budgets derives
    the map from parsed robots). h0 is budgeted to 1 and h7 to 2 against a
    default of 3; the oracle is the same rank with a CASE'd cap."""
    from simplecrawler_spark.operators.politeness import select_due
    frontier = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("h"), (F.col("user_id") % 23).cast("string")).alias("host"),
        F.lit("queued").alias("status"))
    due = select_due(frontier, tokens_per_host=3,
                     approx_rows=frontier.count(),
                     host_budgets={"h0": 1, "h7": 2})
    w = Window.partitionBy("host").orderBy("id")
    return (due.withColumn("rk", F.row_number().over(w).cast("long"))
            .select("id", "host", "rk"))


def q_seen_antijoin(spark, sf_dir):
    """Q1/Q2: URL-seen dedupe — candidate URLs anti-joined against the seen
    set (exact path of the Bloom-prefiltered check)."""
    ev = _t(spark, sf_dir, "events")
    url = F.concat(F.lit("http://h"), (F.col("user_id") % 23).cast("string"),
                   F.lit(".test/p/"), (F.col("event_id") % 500).cast("string"))
    cand = ev.filter("event_type = 'click'").select(url.alias("url")).distinct()
    seen = ev.filter("event_type = 'view'").select(url.alias("url")).distinct()
    return cand.join(seen, "url", "left_anti")


def q_canonicalize(spark, sf_dir):
    """P1/P2: cleanURL + processURL canonicalization (lowercase scheme/host,
    default-port strip, fragment strip, sorted query keys with duplicate
    value order preserved) via the exactness kernels in an Arrow pass."""
    from simplecrawler_spark.functions.urlkit import (UrlOptions, clean_url,
                                                      process_url)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("HTTP://WWW.Example"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".COM:80/Path"), (F.col("doc_id") % 7).cast("string"),
                 F.lit("/page?b=2&a=1&a=3#frag")).alias("raw_url"))
    opts = UrlOptions(sort_query_parameters=True)

    def canon(batches):
        for pdf in batches:
            out_urls = []
            for raw in pdf["raw_url"]:
                cleaned = clean_url(raw, "http")
                item = process_url(cleaned, None, 0, opts, initial_url=cleaned)
                out_urls.append(item["url"] if item else None)
            pdf = pdf[["doc_id"]].copy()
            pdf["url"] = out_urls
            yield pdf

    return docs.mapInPandas(canon, "doc_id long, url string")


def q_discovery(spark, sf_dir):
    """D1-D3: regex link discovery + clean/absolutize/ordered-dedupe via the
    discovery kernels, over synthetic HTML."""
    from simplecrawler_spark.functions.decode import protocol_supported
    from simplecrawler_spark.functions.discovery import (
        clean_expand_resources, discover_resources)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit('<p>x</p><a href="/p/'), F.col("doc_id").cast("string"),
                 F.lit('">l</a> <img src="http://img.test/i'),
                 (F.col("doc_id") % 9).cast("string"),
                 F.lit('.png"> <a href="/p/'), F.col("doc_id").cast("string"),
                 F.lit('">dup</a>')).alias("html"),
        F.concat(F.lit("http://site.test/d/"),
                 F.col("doc_id").cast("string")).alias("page_url"))

    def disc(batches):
        import pandas as pd
        for pdf in batches:
            rows = {"doc_id": [], "pos": [], "url": []}
            for doc_id, html, page_url in zip(pdf["doc_id"], pdf["html"],
                                              pdf["page_url"]):
                found = discover_resources(html)
                urls = clean_expand_resources(found, page_url, "http",
                                              protocol_supported)
                for i, u in enumerate(urls):
                    rows["doc_id"].append(doc_id)
                    rows["pos"].append(i)
                    rows["url"].append(u)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(disc, "doc_id long, pos long, url string")


def q_robots_filter(spark, sf_dir):
    """P6: robots.txt allow/deny evaluation (prefix + $-anchored wildcard
    rules) via the robots-parser-compatible kernel."""
    from simplecrawler_spark.functions.robots import parse_robots
    rf = parse_robots("http://site.test/robots.txt",
                      "User-agent: *\nDisallow: /p3\nDisallow: /p7$\n")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("http://site.test/p"),
                 (F.col("event_id") % 10).cast("string")).alias("url"))

    def check(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["allowed"] = [bool(rf.is_allowed(u, "*")) for u in pdf["url"]]
            yield pdf

    return ev.mapInPandas(check, "event_id long, url string, allowed boolean")


def q_robots_side_join(spark, sf_dir):
    """P6 at scale: the distributed ``robots_rules`` side-table path — one
    row per origin with the UA-selected rule list (rules_payload), verdicts
    by origin join + eval_rules Arrow kernel (plans/crawl.py side-table
    mode). Exercises longest-prefix Allow override (h0), $-anchored rules
    (h2), a wildcard rule (h4), and the no-row default-allow (h1/h3)."""
    from simplecrawler_spark.functions.robots import eval_rules, parse_robots
    bodies = {0: "User-agent: *\nDisallow: /q\nAllow: /q7\n",
              2: "User-agent: *\nDisallow: /q2\nDisallow: /q5$\n",
              4: "User-agent: *\nDisallow: /*8$\nDisallow: /q4\n"}
    rows = []
    for k, body in bodies.items():
        rf = parse_robots(f"http://h{k}.test/robots.txt", body)
        rows.append((rf.protocol, rf.host, rf.port,
                     rf.rules_payload("Node/x")))
    side = spark.createDataFrame(
        rows, "p string, h string, prt int, rules_json string")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("h"), (F.col("event_id") % 5).cast("string"),
                 F.lit(".test")).alias("host"),
        (F.floor(F.col("event_id") / 5) % 10).cast("string").alias("q"))
    ev = ev.select(
        "event_id", "host",
        F.concat(F.lit("http://"), F.col("host"), F.lit("/q"),
                 F.col("q")).alias("url"))
    joined = (ev.join(side, (F.col("host") == F.col("h"))
                      & (F.lit("http") == F.col("p"))
                      & (F.lit(80) == F.col("prt")), "left")
              .select("event_id", "url", "rules_json"))

    def check(batches):
        for pdf in batches:
            out = pdf[["event_id", "url"]].copy()
            out["allowed"] = [
                True if rj is None else eval_rules(rj, u)
                for rj, u in zip(pdf["rules_json"], pdf["url"])]
            yield out

    return joined.mapInPandas(
        check, "event_id long, url string, allowed boolean")


def q_status_branch(spark, sf_dir):
    """S2: handleResponse status branching (2xx/304/3xx+location/404/410/
    else-failed) as one JVM projection."""
    ev = _t(spark, sf_dir, "events")
    code = F.element_at(F.array(*[F.lit(c) for c in
                                  (200, 304, 301, 404, 410, 500, 503)]),
                        (F.col("event_id") % 7 + 1).cast("int")).cast("long")
    loc = F.when(code == 301, F.lit("/next"))
    status = (F.when(code.between(200, 299), "downloaded")
               .when(code == 304, "spooled")
               .when(code.between(300, 399) & loc.isNotNull(), "redirected")
               .when(code.isin(404, 410), "notfound")
               .otherwise("failed"))
    return ev.select("event_id", code.alias("code"), status.alias("status"))


def q_depth_gate(spark, sf_dir):
    """P7: maxDepth enqueue gate (maxDepth=3; referrer depth+1 must fit)."""
    ev = _t(spark, sf_dir, "events")
    depth = (F.col("event_id") % 6 + 1).cast("long")
    return (ev.select("event_id", depth.alias("depth"))
            .filter(F.col("depth") + 1 <= 3))


def q_dense_ids(spark, sf_dir):
    """Q1 id assignment: the wave loop's dense queue-id ranking
    (crawler.ts:1109 — monotonically increasing enqueue ids) via the
    FULLY-LAZY bounds path of operators/ids.py (bucket offset +
    row_number per bucket over one shared Exchange, zero driver actions
    — the store-backed wave hot path). Bounds are fixed split points;
    placement only affects balance, never the mapping, so the oracle is
    a plain global ROW_NUMBER."""
    from simplecrawler_spark.operators.ids import assign_dense_ids
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    with_ids, _ = assign_dense_ids(orders, ["o_custkey", "o_orderkey"],
                                   start=0,
                                   range_bounds=[100, 400, 900, 1200])
    return with_ids.select("o_custkey", "o_orderkey", "id")


def q_queue_stats(spark, sf_dir):
    """Q6-Q8/Q9: queue statistics (min/max/avg/count) grouped by type."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"),
                 F.round(F.avg("value"), 6).alias("avg_value"))
            )


# ----------------------------------------------------------- dedup families
def q_exact_dup_groups(spark, sf_dir):
    return tp.exact_duplicates(_t(spark, sf_dir, "documents"))


def q_dedupe_keep_first(spark, sf_dir):
    return tp.dedupe_keep_first(_t(spark, sf_dir, "documents")) \
        .select("doc_id", "lang", "source")


def q_minhash_signatures(spark, sf_dir):
    return tp.minhash_signatures(_t(spark, sf_dir, "documents"),
                                 num_hashes=8, n=5, prefix_len=100) \
        .select("doc_id", F.col("h").cast("long").alias("h"), "minhash")


def q_minhash_pairs(spark, sf_dir):
    sig = tp.minhash_signatures(_t(spark, sf_dir, "documents"),
                                num_hashes=8, n=5, prefix_len=100)
    return tp.minhash_candidate_pairs(tp.minhash_bands(sig, rows_per_band=4))


def q_simhash(spark, sf_dir):
    return tp.simhash(_t(spark, sf_dir, "documents"), bits=16)


def q_jaccard_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    small = docs.filter("doc_id < 20")
    a = small.select(F.col("doc_id").alias("doc_a"))
    b = small.select(F.col("doc_id").alias("doc_b"))
    pairs = a.crossJoin(b).filter("doc_a < doc_b")
    return tp.jaccard_pairs(small, pairs, prefix_len=100, n=5)


def q_fingerprint(spark, sf_dir):
    return tp.fingerprint(_t(spark, sf_dir, "documents"))


# ------------------------------------------------------------- text analysis
def q_token_stats(spark, sf_dir):
    return tp.token_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_chars_actual").cast("long").alias("n_chars_actual"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "chars_per_token", "punct_ratio")


def q_quality(spark, sf_dir):
    return tp.quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens"),
        "stopword_ratio", "quality")


def q_lang_id(spark, sf_dir):
    return tp.lang_id(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------- similarity search
def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return (cosine_topk(emb, q, k=5)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _ann_lsh_oracle() -> str:
    """DuckDB replica of the hyperplane bucketing: same ±1 plane literals,
    bucket bit p = sign of dot(embedding, plane_p), join on bucket, cosine
    rank within."""
    emb = "list_transform(embedding, x -> x::DOUBLE)"
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({emb}, "
        f"[{', '.join(str(x) for x in plane)}]) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(PLANES))
    return f"""
        WITH b AS (
          SELECT vec_id, {emb} AS emb, ({bucket})::BIGINT AS bucket
          FROM embeddings)
        SELECT q_id, vec_id, rank FROM (
          SELECT q.vec_id AS q_id, e.vec_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.emb, e.emb) DESC,
                            e.vec_id)::BIGINT AS rank
          FROM b q JOIN b e USING (bucket)
          WHERE q.vec_id % 100 = 0 AND e.vec_id <> q.vec_id)
        WHERE rank <= 5
    """


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via shared-bucket LSH join; sim is
    not output (fold order differs between engines at the last ulp) — the
    pair set at threshold 0.35 is the contract (synthetic embeddings are
    near-orthogonal; max pairwise sim ~0.51)."""
    from simplecrawler_spark.operators.similarity import cosine_near_dup_pairs
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    return (cosine_near_dup_pairs(emb, PLANES, threshold=0.35)
            .select("vec_a", "vec_b").orderBy("vec_a", "vec_b"))


def _embed_neardup_oracle() -> str:
    emb = "list_transform(embedding, x -> x::DOUBLE)"
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({emb}, "
        f"[{', '.join(str(x) for x in plane)}]) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(PLANES))
    return f"""
        WITH b AS (
          SELECT vec_id, {emb} AS emb, ({bucket})::BIGINT AS bucket
          FROM embeddings)
        SELECT a.vec_id AS vec_a, e.vec_id AS vec_b
        FROM b a JOIN b e USING (bucket)
        WHERE a.vec_id < e.vec_id
          AND list_cosine_similarity(a.emb, e.emb) >= 0.35
        ORDER BY vec_a, vec_b
    """


def q_ann_lsh(spark, sf_dir):
    """IVF/LSH-style scale path: hyperplane-sign buckets, join on bucket.
    Oracle: the same bucketing + ranking in DuckDB SQL (plane literals
    shared); recall vs brute force additionally tested in tests/."""
    from simplecrawler_spark.operators.similarity import cosine_topk_lsh
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return (cosine_topk_lsh(emb, q, PLANES, k=5)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


PLANE_SETS = _plane_sets()


def q_ann_multiprobe(spark, sf_dir):
    """Multi-table LSH top-k (8 tables x 7 hyperplanes): candidates share a
    bucket in ANY table, scored once. Recall/comparisons vs brute force is
    measured in bench.py; the oracle replicates the multi-table bucketing
    in SQL."""
    from simplecrawler_spark.operators.similarity import cosine_topk_lsh_multi
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return (cosine_topk_lsh_multi(emb, q, PLANE_SETS, k=5)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _ann_multiprobe_oracle() -> str:
    """DuckDB replica of the multi-table bucketing: per-table bucket rows
    via UNION ALL, DISTINCT candidate pairs across tables, cosine rank."""
    emb = "list_transform(embedding, x -> x::DOUBLE)"
    parts = []
    for t, planes in enumerate(PLANE_SETS):
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product({emb}, "
            f"[{', '.join(str(x) for x in plane)}]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(planes))
        parts.append(f"SELECT vec_id, {t} AS tbl, ({bucket})::BIGINT AS bucket "
                     f"FROM embeddings")
    union = "\n          UNION ALL ".join(parts)
    return f"""
        WITH b AS (
          {union}),
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, e.vec_id
          FROM b q JOIN b e USING (tbl, bucket)
          WHERE q.vec_id % 100 = 0 AND e.vec_id <> q.vec_id),
        emb AS (SELECT vec_id, {emb} AS emb FROM embeddings)
        SELECT q_id, vec_id, rank FROM (
          SELECT c.q_id, c.vec_id,
                 row_number() OVER (
                   PARTITION BY c.q_id
                   ORDER BY list_cosine_similarity(qe.emb, ee.emb) DESC,
                            c.vec_id)::BIGINT AS rank
          FROM cand c
          JOIN emb qe ON qe.vec_id = c.q_id
          JOIN emb ee ON ee.vec_id = c.vec_id)
        WHERE rank <= 5
    """


PLANE_SETS_DIRECTED = _plane_sets(n_tables=4, n_planes=5)


def q_ann_multiprobe_directed(spark, sf_dir):
    """Query-directed multiprobe LSH (Lv et al., VLDB 2007): queries probe
    their base bucket PLUS the buckets reached by flipping the two
    lowest-|margin| bits and the (1st+2nd)-smallest pair — the bits most
    likely to disagree with a true neighbor's code. 4 tables x 5
    hyperplanes, so each query probes 4 x 4 buckets while the corpus stays
    single-code. The oracle replicates the margin ranking (abs(dot), plane
    tie-break), the XOR probe set and the cosine rank in SQL."""
    from simplecrawler_spark.operators.similarity import cosine_topk_lsh_multi
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return (cosine_topk_lsh_multi(emb, q, PLANE_SETS_DIRECTED, k=5,
                                  probe_bits=2, probe_pairs=1)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _ann_multiprobe_directed_oracle() -> str:
    """DuckDB replica of the query-directed probe set: per-(vec, table)
    plane dots via a VALUES join, base code, margin rank
    row_number() OVER (ORDER BY abs(d), p), single flips rk<=2, the
    (rk1, rk2) pair flip, then DISTINCT candidate pairs + cosine rank."""
    emb = "list_transform(embedding, x -> x::DOUBLE)"
    vals = ", ".join(
        f"({t}, {p}, [{', '.join(str(x) for x in plane)}])"
        for t, planes in enumerate(PLANE_SETS_DIRECTED)
        for p, plane in enumerate(planes))
    return f"""
        WITH dots AS (
          SELECT e.vec_id, pl.tbl, pl.p,
                 list_dot_product({emb.replace('embedding', 'e.embedding')},
                                  pl.pvec) AS d
          FROM embeddings e
          CROSS JOIN (VALUES {vals}) pl(tbl, p, pvec)),
        codes AS (
          SELECT vec_id, tbl,
                 SUM(CASE WHEN d >= 0 THEN 1::BIGINT << p
                          ELSE 0 END)::BIGINT AS bucket
          FROM dots GROUP BY vec_id, tbl),
        margins AS (
          SELECT vec_id, tbl, p,
                 row_number() OVER (PARTITION BY vec_id, tbl
                                    ORDER BY abs(d), p) AS rk
          FROM dots),
        qflips AS (
          SELECT vec_id, tbl,
                 max(CASE WHEN rk = 1 THEN p END) AS p1,
                 max(CASE WHEN rk = 2 THEN p END) AS p2
          FROM margins WHERE vec_id % 100 = 0 GROUP BY vec_id, tbl),
        qprobes AS (
          SELECT vec_id, tbl, bucket FROM codes WHERE vec_id % 100 = 0
          UNION ALL
          SELECT f.vec_id, f.tbl, xor(c.bucket, 1::BIGINT << f.p1)
          FROM qflips f JOIN codes c USING (vec_id, tbl)
          UNION ALL
          SELECT f.vec_id, f.tbl, xor(c.bucket, 1::BIGINT << f.p2)
          FROM qflips f JOIN codes c USING (vec_id, tbl)
          UNION ALL
          SELECT f.vec_id, f.tbl,
                 xor(c.bucket, (1::BIGINT << f.p1) | (1::BIGINT << f.p2))
          FROM qflips f JOIN codes c USING (vec_id, tbl)),
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, e.vec_id
          FROM qprobes q JOIN codes e USING (tbl, bucket)
          WHERE e.vec_id <> q.vec_id),
        emb AS (SELECT vec_id, {emb} AS emb FROM embeddings)
        SELECT q_id, vec_id, rank FROM (
          SELECT c.q_id, c.vec_id,
                 row_number() OVER (
                   PARTITION BY c.q_id
                   ORDER BY list_cosine_similarity(qe.emb, ee.emb) DESC,
                            c.vec_id)::BIGINT AS rank
          FROM cand c
          JOIN emb qe ON qe.vec_id = c.q_id
          JOIN emb ee ON ee.vec_id = c.vec_id)
        WHERE rank <= 5
    """


def q_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) top-k: corpus vectors partition into nearest-
    centroid cells, queries probe the 2 nearest of 16 cells. The driver
    entry uses iters=0 centroids (the 16 lowest vec_ids' embeddings) so the
    DuckDB oracle can rebuild the identical index in pure SQL; Lloyd
    training (iters>0) is covered by tests/test_ann_ivf.py."""
    from simplecrawler_spark.operators.similarity import (cosine_topk_ivf,
                                                          ivf_train)
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    cents = ivf_train(emb, n_centroids=16, iters=0)
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return (cosine_topk_ivf(emb, q, cents, k=5, nprobe=2)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _ann_ivf_oracle() -> str:
    """DuckDB replica of the IVF index: same centroids (16 lowest vec_ids),
    same nearest-cell assignment (sim DESC, cid ASC tie-break), same
    2-probe query routing, cosine rank within probed cells."""
    emb = "list_transform(embedding, x -> x::DOUBLE)"
    return f"""
        WITH e AS (SELECT vec_id, {emb} AS emb FROM embeddings),
        c AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb AS cvec
          FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 16)),
        assign AS (
          SELECT vec_id, emb, cid FROM (
            SELECT e.vec_id, e.emb, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.emb, c.cvec) DESC,
                              c.cid) AS rn
            FROM e CROSS JOIN c)
          WHERE rn = 1),
        probe AS (
          SELECT vec_id AS q_id, emb AS q_vec, cid FROM (
            SELECT e.vec_id, e.emb, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.emb, c.cvec) DESC,
                              c.cid) AS rn
            FROM e CROSS JOIN c
            WHERE e.vec_id % 100 = 0)
          WHERE rn <= 2)
        SELECT q_id, vec_id, rank FROM (
          SELECT p.q_id, a.vec_id,
                 row_number() OVER (
                   PARTITION BY p.q_id
                   ORDER BY list_cosine_similarity(p.q_vec, a.emb) DESC,
                            a.vec_id)::BIGINT AS rank
          FROM probe p JOIN assign a USING (cid)
          WHERE a.vec_id <> p.q_id)
        WHERE rank <= 5
    """


# ----------------------------------------------------------------- multimodal
def q_multimodal_features(spark, sf_dir):
    return image_features(_t(spark, sf_dir, "documents"))


# --------------------------------------------------- CC corpus extraction (T1)
# Default sf for the oracle string when the query has not run in this
# process (the driver's oracle pass runs at sf0.01 per the task contract);
# q_cc_extract records the sf it actually ran at, so an oracle_sql() built
# afterwards — the driver and the local test harness both do this — always
# points at the SAME per-(uid, sf) dir the query wrote.
CC_ORACLE_SF = 0.01
_CC_LAST_SF = [CC_ORACLE_SF]


def _cc_sf(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        return CC_ORACLE_SF


def _cc_oracle_paths(sf: float):
    """Per-(uid, sf) working dir: the query OVERWRITES it on every run and
    the driver's oracle pass runs right after the Spark query, so both
    sides read the same bytes — while runs at a DIFFERENT sf (the bench at
    sf0.1 interleaved with correctness at sf0.01) or by a different user
    write disjoint dirs instead of clobbering each other's oracle files.
    (Two concurrent same-uid runs at the SAME sf still share a dir — noted
    in COVERAGE.md.)"""
    d = f"/tmp/simplecrawler_spark_cc_oracle_{os.getuid()}_sf{sf:g}"
    return f"{d}/corpus.parquet", f"{d}/extracted.parquet"


def q_cc_extract(spark, sf_dir):
    """input_hint invariant at scale: synthesize the (url, warc_ts, html,
    text, lang) corpus deterministically, run the vectorized extractor over
    the BINARY html, and report per-lang totals + byte-identity matches.

    The binary decode itself has no SQL twin, so the oracle verifies the
    CLAIM instead: the query writes the corpus's (url, text, lang) ground
    truth and the extractor's (url, extracted_text) output to parquet and
    computes its aggregate FROM THOSE FILES; the DuckDB oracle recomputes
    the same join + equality aggregate over the same files independently.
    A broken extractor shows up as n_identical < n_pages on the Spark side
    and a value-hash mismatch is impossible to hide (per-row byte identity
    is additionally asserted by tests/test_ccpages_extract.py)."""
    from simplecrawler_spark.operators.extract import extract_text
    from simplecrawler_spark.sources.ccpages import synth_cc_pages
    sf = _cc_sf(sf_dir)
    _CC_LAST_SF[0] = sf
    cc = synth_cc_pages(spark, max(int(200_000 * sf), 1_000), 64)
    corpus_path, extracted_path = _cc_oracle_paths(sf)
    cc.select("url", "text", "lang").write.mode("overwrite") \
        .parquet(corpus_path)
    extract_text(cc).select("url", "extracted_text").write \
        .mode("overwrite").parquet(extracted_path)
    c = spark.read.parquet(corpus_path)
    e = spark.read.parquet(extracted_path)
    return (c.join(e, "url")
            .groupBy("lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.when(F.col("extracted_text") == F.col("text"), 1)
                       .otherwise(0)).alias("n_identical"))
            .orderBy("lang"))


def _cc_extract_oracle() -> str:
    """DuckDB twin over the SAME parquet files the Spark query wrote (the
    oracle pass runs right after the Spark query in the same process, so
    the recorded last-run sf selects the matching per-(uid, sf) dir)."""
    corpus_path, extracted_path = _cc_oracle_paths(_CC_LAST_SF[0])
    return f"""
        SELECT c.lang,
               count(*)::BIGINT AS n_pages,
               sum(CASE WHEN e.extracted_text = c.text
                        THEN 1 ELSE 0 END)::BIGINT AS n_identical
        FROM read_parquet('{corpus_path}/*.parquet') c
        JOIN read_parquet('{extracted_path}/*.parquet') e USING (url)
        GROUP BY c.lang ORDER BY c.lang
    """


# ============================================================ driver contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: FIFO politeness wave selection at sf0.001."""
    return q_fifo_politeness(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fifo_politeness": q_fifo_politeness,
        "fifo_crawl_delay": q_fifo_crawl_delay,
        "seen_antijoin": q_seen_antijoin,
        "canonicalize": q_canonicalize,
        "discovery": q_discovery,
        "robots_filter": q_robots_filter,
        "robots_side_join": q_robots_side_join,
        "status_branch": q_status_branch,
        "depth_gate": q_depth_gate,
        "dense_ids": q_dense_ids,
        "queue_stats": q_queue_stats,
        "exact_dup_groups": q_exact_dup_groups,
        "dedupe_keep_first": q_dedupe_keep_first,
        "minhash_signatures": q_minhash_signatures,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "jaccard_pairs": q_jaccard_pairs,
        "fingerprint": q_fingerprint,
        "token_stats": q_token_stats,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_multiprobe": q_ann_multiprobe,
        "ann_multiprobe_directed": q_ann_multiprobe_directed,
        "ann_ivf": q_ann_ivf,
        "embed_neardup": q_embed_neardup,
        "multimodal_features": q_multimodal_features,
        "cc_extract": q_cc_extract,
    }


_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

_LANG_VALUES = ", ".join(
    "('%s', [%s], %d)" % (code, ", ".join(f"'{w}'" for w in words), pri)
    for pri, (code, words) in enumerate(sorted(tp.LANG_STOPWORDS.items())))


def oracle_sql() -> dict[str, str]:
    return {
        "fifo_politeness": """
            SELECT id, host, rk FROM (
              SELECT event_id AS id,
                     'h' || (user_id % 23) AS host,
                     row_number() OVER (PARTITION BY 'h' || (user_id % 23)
                                        ORDER BY event_id) AS rk
              FROM events)
            WHERE rk <= 3
        """,
        "fifo_crawl_delay": """
            SELECT id, host, rk FROM (
              SELECT event_id AS id,
                     'h' || (user_id % 23) AS host,
                     row_number() OVER (PARTITION BY 'h' || (user_id % 23)
                                        ORDER BY event_id) AS rk
              FROM events)
            WHERE rk <= CASE host WHEN 'h0' THEN 1 WHEN 'h7' THEN 2
                        ELSE 3 END
        """,
        "seen_antijoin": """
            WITH u AS (SELECT event_type,
                              'http://h' || (user_id % 23) || '.test/p/' ||
                              (event_id % 500) AS url FROM events),
            cand AS (SELECT DISTINCT url FROM u WHERE event_type = 'click'),
            seen AS (SELECT DISTINCT url FROM u WHERE event_type = 'view')
            SELECT url FROM cand
            WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = cand.url)
        """,
        "canonicalize": """
            SELECT doc_id,
                   'http://www.example' || (doc_id % 50) || '.com/Path' ||
                   (doc_id % 7) || '/page?a=1&a=3&b=2' AS url
            FROM documents
        """,
        "discovery": """
            SELECT doc_id, 0::BIGINT AS pos,
                   'http://site.test/p/' || doc_id AS url FROM documents
            UNION ALL
            SELECT doc_id, 1::BIGINT AS pos,
                   'http://img.test/i' || (doc_id % 9) || '.png' AS url
            FROM documents
        """,
        "robots_filter": """
            SELECT event_id,
                   'http://site.test/p' || (event_id % 10) AS url,
                   NOT ((event_id % 10) = 3 OR (event_id % 10) = 7) AS allowed
            FROM events
        """,
        "robots_side_join": """
            SELECT event_id,
                   'http://h' || (event_id % 5) || '.test/q'
                       || ((event_id // 5) % 10) AS url,
                   CASE WHEN (event_id % 5) = 0
                             THEN ((event_id // 5) % 10) = 7
                        WHEN (event_id % 5) = 2
                             THEN ((event_id // 5) % 10) NOT IN (2, 5)
                        WHEN (event_id % 5) = 4
                             THEN ((event_id // 5) % 10) NOT IN (4, 8)
                        ELSE TRUE END AS allowed
            FROM events
        """,
        "status_branch": """
            SELECT event_id, code,
                   CASE WHEN code BETWEEN 200 AND 299 THEN 'downloaded'
                        WHEN code = 304 THEN 'spooled'
                        WHEN code = 301 THEN 'redirected'
                        WHEN code IN (404, 410) THEN 'notfound'
                        ELSE 'failed' END AS status
            FROM (SELECT event_id,
                         ([200,304,301,404,410,500,503])[(event_id % 7) + 1]::BIGINT
                         AS code FROM events)
        """,
        "depth_gate": """
            SELECT event_id, (event_id % 6 + 1)::BIGINT AS depth FROM events
            WHERE (event_id % 6 + 1) + 1 <= 3
        """,
        "dense_ids": """
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (ORDER BY o_custkey, o_orderkey) - 1
                   AS id
            FROM orders
        """,
        "queue_stats": """
            SELECT event_type, count(*) AS n,
                   min(value) AS min_value, max(value) AS max_value,
                   round(avg(value), 6)::DOUBLE AS avg_value
            FROM events GROUP BY event_type
        """,
        "exact_dup_groups": """
            SELECT md5(text) AS text_hash, count(*) AS n_docs,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "dedupe_keep_first": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "minhash_signatures": """
            WITH p AS (SELECT doc_id, substr(text, 1, 100) AS pre
                       FROM documents WHERE length(substr(text, 1, 100)) >= 5),
            sh AS (SELECT doc_id, substr(pre, g, 5) AS shingle
                   FROM (SELECT doc_id, pre,
                                unnest(generate_series(1, length(pre) - 4)) AS g
                         FROM p)),
            hv AS (SELECT doc_id, h,
                          ('0x' || substr(md5(shingle || ':' || h), 1, 15))::BIGINT AS v
                   FROM sh, generate_series(0, 7) t2(h))
            SELECT doc_id, h, min(v) AS minhash FROM hv GROUP BY doc_id, h
        """,
        "minhash_pairs": """
            WITH p AS (SELECT doc_id, substr(text, 1, 100) AS pre
                       FROM documents WHERE length(substr(text, 1, 100)) >= 5),
            sh AS (SELECT doc_id, substr(pre, g, 5) AS shingle
                   FROM (SELECT doc_id, pre,
                                unnest(generate_series(1, length(pre) - 4)) AS g
                         FROM p)),
            hv AS (SELECT doc_id, h,
                          ('0x' || substr(md5(shingle || ':' || h), 1, 15))::BIGINT AS v
                   FROM sh, generate_series(0, 7) t2(h)),
            sig AS (SELECT doc_id, h, min(v) AS minhash FROM hv GROUP BY doc_id, h),
            bands AS (SELECT doc_id, h // 4 AS band,
                             md5(string_agg(h || ':' || minhash, ','
                                            ORDER BY h || ':' || minhash)) AS band_key
                      FROM sig GROUP BY doc_id, h // 4)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b USING (band, band_key)
            WHERE a.doc_id < b.doc_id
        """,
        "simhash": """
            WITH toks AS (SELECT doc_id, unnest({toks}) AS tok FROM documents),
            hv AS (SELECT doc_id,
                          ('0x' || substr(md5(tok), 1, 15))::BIGINT AS v FROM toks),
            votes AS (SELECT doc_id, b,
                             sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                      FROM hv, generate_series(0, 15) t(b) GROUP BY doc_id, b)
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
                   AS simhash
            FROM votes GROUP BY doc_id
        """.replace("{toks}", _TOKS),
        "jaccard_pairs": """
            WITH d AS (SELECT doc_id, substr(text, 1, 100) AS pre
                       FROM documents WHERE doc_id < 20),
            sh AS (SELECT DISTINCT doc_id, substr(pre, g, 5) AS shingle
                   FROM (SELECT doc_id, pre,
                                unnest(generate_series(1, length(pre) - 4)) AS g
                         FROM d WHERE length(pre) >= 5)),
            s AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle
                                         AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
                   coalesce(i, 0) / (sa.n + sb.n - coalesce(i, 0)) AS jaccard
            FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id
            LEFT JOIN inter ON inter.doc_a = sa.doc_id AND inter.doc_b = sb.doc_id
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint
            FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars_actual,
                   len({toks})::BIGINT AS n_tokens,
                   length(text) / greatest(len({toks}), 1) AS chars_per_token,
                   length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                     / greatest(length(text), 1)::DOUBLE AS punct_ratio
            FROM documents
        """.replace("{toks}", _TOKS),
        "quality": """
            WITH t AS (SELECT doc_id, lang, length(text) AS n_char,
                              {toks} AS toks,
                              ['the','a','of','and','to','in','is','that','for','with']
                              AS sw
                       FROM documents)
            SELECT doc_id, lang, len(toks)::BIGINT AS n_tokens,
                   len(list_intersect(toks, sw))
                     / greatest(len(toks), 1)::DOUBLE AS stopword_ratio,
                   (len(list_intersect(toks, sw))
                     / greatest(len(toks), 1)::DOUBLE) * 0.5
                   + least(n_char / 500.0, 1.0) * 0.5 AS quality
            FROM t
        """.replace("{toks}", _TOKS),
        "lang_id": """
            WITH t AS (SELECT doc_id, lang AS lang_true, {toks} AS toks
                       FROM documents),
            scores AS (SELECT doc_id, lang_true, s.code,
                              len(list_intersect(toks, s.words)) AS score, s.pri
                       FROM t, (VALUES {langs}) s(code, words, pri))
            SELECT doc_id, lang_true, code AS lang_pred FROM scores
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, pri ASC) = 1
        """.replace("{toks}", _TOKS).replace("{langs}", _LANG_VALUES),
        "ann_topk": """
            SELECT q_id, vec_id, rank FROM (
              SELECT q.vec_id AS q_id, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id)::BIGINT AS rank
              FROM embeddings q, embeddings e
              WHERE q.vec_id % 100 = 0 AND e.vec_id <> q.vec_id)
            WHERE rank <= 5
        """,
        "ann_lsh": _ann_lsh_oracle(),
        "ann_multiprobe": _ann_multiprobe_oracle(),
        "ann_multiprobe_directed": _ann_multiprobe_directed_oracle(),
        "cc_extract": _cc_extract_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "embed_neardup": _embed_neardup_oracle(),
        "multimodal_features": """
            WITH p AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'GIF89a' || text
                          WHEN doc_id % 5 = 1 THEN 'GIF87a' || text
                          ELSE text END AS payload
              FROM documents)
            SELECT doc_id,
                   octet_length(encode(payload))::BIGINT AS n_bytes,
                   md5(payload) AS payload_hash,
                   -- ASCII-reachable magic prefixes only (UTF-8 text can
                   -- never start with the 0x89/0xFF PNG/JPEG signature
                   -- bytes); the GIF bodies are garbage, so the real GIF
                   -- decoder correctly declines them (decoded=FALSE)
                   CASE WHEN payload LIKE 'GIF87a%'
                          OR payload LIKE 'GIF89a%' THEN 'gif'
                        WHEN payload LIKE 'RIFF%'
                          AND substr(payload, 9, 4) = 'WEBP' THEN 'webp'
                        WHEN payload LIKE 'BM%' THEN 'bmp'
                        ELSE 'unknown' END AS format,
                   ((octet_length(encode(payload)) % 64) + 1)::INT
                     AS fake_width,
                   ((('0x' || substr(md5(payload), 1, 2))::INT % 64) + 1)::INT
                     AS fake_height,
                   ('0x' || substr(md5(payload), 3, 4))::INT / 65535.0
                     AS fake_mean,
                   FALSE AS decoded,
                   CAST(NULL AS INTEGER) AS width,
                   CAST(NULL AS INTEGER) AS height,
                   CAST(NULL AS DOUBLE) AS mean_pixel
            FROM p
        """,
    }
