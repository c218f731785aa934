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
    # dedupe (q_id, vec_id) on ids ONLY, then re-join the vectors — a pair
    # found in several tables would otherwise drag both full embedding
    # arrays through the dedupe shuffle (the widest exchange of the plan)
    cand_ids = (q_c.select("q_id", "table", "bucket")
                .join(emb_c.select("vec_id", "table", "bucket"),
                      ["table", "bucket"])
                .filter(F.col("q_id") != F.col("vec_id"))
                .select("q_id", "vec_id")
                .dropDuplicates(["q_id", "vec_id"]))
    cand = (cand_ids
            .join(F.broadcast(queries), "q_id")
            .join(embeddings, "vec_id"))
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


# ---------------------------------------------------------------- IVF index
# Inverted-file ANN (the centroid-partitioned scale path, complementing the
# hyperplane LSH above): corpus vectors are assigned to their nearest
# centroid (one partition per cell), queries probe only the nprobe nearest
# cells. Expected comparisons ~= nprobe/n_centroids of brute force. All
# scoring stays JVM-side; the driver holds only n_centroids x dim floats.

def _centroid_array(centroids: List) -> "F.Column":
    """Literal array<struct<cid,cvec>> from [(cid, [floats]), ...]."""
    return F.array(*[
        F.struct(F.lit(int(cid)).cast("int").alias("cid"),
                 F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"))
        for cid, vec in centroids])


def _neg_sim_structs(vec, cents):
    """array<struct<negsim,cid>> — struct order gives (sim DESC, cid ASC):
    array_min = nearest centroid, sort_array[:nprobe] = probe list."""
    return F.transform(cents, lambda c: F.struct(
        (-(_dot(vec, c["cvec"]) / (_norm(vec) * _norm(c["cvec"]))))
        .alias("negsim"),
        c["cid"].alias("cid")))


def ivf_assign(embeddings: DataFrame, centroids: List,
               vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per vector (ties -> lowest cid). One narrow
    projection, no shuffle: the centroid list is a literal in the plan."""
    arr = _neg_sim_structs(F.col(vec_col), _centroid_array(centroids))
    return embeddings.withColumn("cid", F.array_min(arr)["cid"])


def ivf_train(embeddings: DataFrame, n_centroids: int = 16, iters: int = 2,
              vec_col: str = "embedding", id_col: str = "vec_id") -> List:
    """Deterministic cosine-assignment k-means (assignment by cosine
    similarity, plain per-dimension mean update — centroids are NOT
    renormalized to unit norm, so this is not textbook spherical k-means;
    cosine assignment is norm-invariant, so cells differ from spherical
    k-means only via the un-normalized mean drift). Init = the vectors of
    the n_centroids lowest ids; `iters` Lloyd rounds (assign -> mean via
    posexplode+groupBy). Each round is one distributed pass; the driver
    collects only n_centroids x dim floats. An empty cell keeps its
    previous centroid (no respawn nondeterminism)."""
    init = embeddings.select(id_col, vec_col).orderBy(id_col) \
        .limit(n_centroids).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = ivf_assign(embeddings.select(vec_col), cents, vec_col)
        rows = (assigned
                .select("cid", F.posexplode(vec_col).alias("pos", "v"))
                .groupBy("cid", "pos").agg(F.avg("v").alias("m"))
                .collect())
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = float(r["m"])
        cents = [(cid, ([d[p] for p in range(len(d))]
                        if (d := by_cid.get(cid)) else vec))
                 for cid, vec in cents]
    return cents


def cosine_topk_ivf(embeddings: DataFrame, queries: DataFrame,
                    centroids: List, k: int = 5,
                    nprobe: int = 2) -> DataFrame:
    """IVF top-k: corpus joins on its single assigned cell, each query
    probes its nprobe nearest cells; a candidate pair appears at most once
    (assignment is unique), so no dedupe pass. Recall misses only neighbors
    whose cell the query did not probe — tune nprobe upward for recall,
    measured against brute force in bench.py."""
    emb_a = ivf_assign(embeddings, centroids)
    cents = _centroid_array(centroids)
    probes = F.slice(F.sort_array(
        _neg_sim_structs(F.col("q_vec"), cents)), 1, nprobe)
    q_p = queries.withColumn(
        "cid", F.explode(F.transform(probes, lambda s: s["cid"])))
    joined = q_p.join(emb_a, "cid").filter(F.col("q_id") != F.col("vec_id"))
    sim = (_dot(F.col("q_vec"), F.col("embedding"))
           / (_norm(F.col("q_vec")) * _norm(F.col("embedding"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (joined.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "sim", "rank"))
