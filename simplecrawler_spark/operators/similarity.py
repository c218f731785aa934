"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (random-hyperplane signs partition the space so
the candidate join touches ~1/2^p of vectors per query).

All math runs JVM-side via ``F.zip_with`` / ``F.aggregate`` higher-order
functions — no Python in the hot path. DuckDB twin: list_cosine_similarity.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Deterministic tie-break by vec_id.

    embeddings: (vec_id, embedding); queries: (q_id, q_vec).
    """
    joined = queries.crossJoin(embeddings).filter(F.col("q_id") != F.col("vec_id"))
    sim = (_dot(F.col("q_vec"), F.col("embedding"))
           / (_norm(F.col("q_vec")) * _norm(F.col("embedding"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (joined.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "sim", "rank"))


def hyperplane_buckets(embeddings: DataFrame, planes: List[List[float]]) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit p = sign of dot with
    plane p. ``planes`` must be fixed/deterministic (seeded offline)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pv = F.array([F.lit(float(x)) for x in plane])
        bit = F.when(_dot(F.col("embedding"), pv) >= 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, p)
    return embeddings.withColumn("bucket", bucket)


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame,
                    planes: List[List[float]], k: int = 5) -> DataFrame:
    """Scale path: bucket both sides by hyperplane signs, join on bucket,
    rank within. Recall < 1 by construction (single probe); use multiple
    plane sets for multi-probe."""
    emb_b = hyperplane_buckets(embeddings, planes)
    q_b = hyperplane_buckets(
        queries.select(F.col("q_id").alias("vec_id"),
                       F.col("q_vec").alias("embedding")), planes) \
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"), "bucket")
    joined = q_b.join(emb_b, "bucket").filter(F.col("q_id") != F.col("vec_id"))
    sim = (_dot(F.col("q_vec"), F.col("embedding"))
           / (_norm(F.col("q_vec")) * _norm(F.col("embedding"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (joined.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "sim", "rank"))


def hyperplane_codes(embeddings: DataFrame,
                     plane_sets: List[List[List[float]]]) -> DataFrame:
    """Multi-table LSH codes: one row per (vector, table) with that table's
    hyperplane-sign bucket. One scan of the input; the per-table buckets are
    computed as a single array column then exploded."""
    structs = []
    for t, planes in enumerate(plane_sets):
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(planes):
            pv = F.array([F.lit(float(x)) for x in plane])
            bit = F.when(_dot(F.col("embedding"), pv) >= 0,
                         F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            bucket = bucket + F.shiftleft(bit, p)
        structs.append(F.struct(F.lit(t).cast("int").alias("table"),
                                bucket.alias("bucket")))
    return (embeddings
            .select("*", F.explode(F.array(*structs)).alias("__tb"))
            .withColumn("table", F.col("__tb.table"))
            .withColumn("bucket", F.col("__tb.bucket"))
            .drop("__tb"))


def cosine_topk_lsh_multi(embeddings: DataFrame, queries: DataFrame,
                          plane_sets: List[List[List[float]]],
                          k: int = 5) -> DataFrame:
    """Multi-table LSH top-k (the recall-tunable scale path): a corpus
    vector is a candidate when it shares a bucket with the query in ANY of
    the L tables; each candidate pair is scored once (dropDuplicates before
    the cosine). Expected comparisons ≈ L / 2^bits of brute force; recall
    for a neighbor at angle θ is 1 - (1 - (1-θ/π)^bits)^L. Tune (bits, L)
    to the target similarity regime — ``bench.py`` measures both knobs
    against brute force on the benchmark corpus."""
    emb_c = hyperplane_codes(embeddings, plane_sets)
    q_c = hyperplane_codes(
        queries.select(F.col("q_id").alias("vec_id"),
                       F.col("q_vec").alias("embedding")), plane_sets) \
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"), "table", "bucket")
    cand = (q_c.join(emb_c, ["table", "bucket"])
            .filter(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "q_vec", "vec_id", "embedding")
            .dropDuplicates(["q_id", "vec_id"]))
    sim = (_dot(F.col("q_vec"), F.col("embedding"))
           / (_norm(F.col("q_vec")) * _norm(F.col("embedding"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (cand.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "sim", "rank"))


def cosine_near_dup_pairs(embeddings: DataFrame, planes: List[List[float]],
                          threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup family):
    candidate pairs share an LSH hyperplane bucket (single probe — the
    shuffle joins |bucket| sized groups, never the full cross product),
    kept when cosine >= threshold. (vec_a < vec_b, sim)."""
    b = hyperplane_buckets(embeddings, planes)
    left = b.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("emb_a"), "bucket")
    right = b.select(F.col("vec_id").alias("vec_b"),
                     F.col("embedding").alias("emb_b"), "bucket")
    sim = (_dot(F.col("emb_a"), F.col("emb_b"))
           / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))))
    return (left.join(right, "bucket")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select("vec_a", "vec_b", "sim"))
