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


def hyperplane_probe_codes(queries: DataFrame,
                           plane_sets: List[List[List[float]]],
                           probe_bits: int = 0,
                           probe_pairs: int = 0) -> DataFrame:
    """Query-side multiprobe codes (query-directed probing, Lv et al.,
    "Multi-Probe LSH", VLDB 2007): per table, emit the base bucket PLUS the
    buckets reached by flipping the lowest-|margin| hyperplane bits — the
    bits most likely to disagree with a true neighbor's code. Probe order:

    - ``probe_bits`` single flips of the 1st..Nth smallest |dot| planes;
    - ``probe_pairs`` pair flips among the 3 smallest, in the fixed order
      (1st+2nd), (1st+3rd), (2nd+3rd).

    Ties on |dot| break by plane index (struct sort), so the probe set is
    deterministic. All math stays JVM-side: margins, sort and XORs are
    higher-order-function expressions over the same one scan that computes
    the base codes. ``probe_bits=probe_pairs=0`` reduces to
    :func:`hyperplane_codes` on the query side.

    Input ``queries``: (vec_id, embedding); output rows
    (vec_id, table, bucket) — multiple per (vector, table)."""
    emb = F.col("embedding")
    structs = []
    for t, planes in enumerate(plane_sets):
        dots = [(_dot(emb, F.array([F.lit(float(x)) for x in plane])))
                for plane in planes]
        bucket = F.lit(0).cast("long")
        for p, d in enumerate(dots):
            bit = F.when(d >= 0, F.lit(1).cast("long")) \
                   .otherwise(F.lit(0).cast("long"))
            bucket = bucket + F.shiftleft(bit, p)
        # plane indices ordered by |margin| ascending (tie: plane index)
        order = F.sort_array(F.array(*[
            F.struct(F.abs(d).alias("m"),
                     F.lit(p).cast("int").alias("p"))
            for p, d in enumerate(dots)]))
        # flip masks for the N lowest-margin planes: singles need
        # probe_bits entries, pair flips draw from the 3 smallest.
        # (F.shiftleft takes a literal bit count, so the dynamic plane
        # index goes through pow(2, p) — exact in double up to 2^53,
        # far above any plane count.)
        need = max(probe_bits, 3 if probe_pairs else 0)
        flip = [F.pow(F.lit(2.0),
                      F.element_at(order, i + 1)["p"].cast("double"))
                .cast("long")
                for i in range(min(need, len(planes)))]
        probes = [bucket]
        probes += [bucket.bitwiseXOR(flip[i])
                   for i in range(min(probe_bits, len(flip)))]
        pair_ix = [(0, 1), (0, 2), (1, 2)][:probe_pairs]
        probes += [bucket.bitwiseXOR(flip[i]).bitwiseXOR(flip[j])
                   for i, j in pair_ix if j < len(flip)]
        structs += [F.struct(F.lit(t).cast("int").alias("table"),
                             pb.alias("bucket")) for pb in probes]
    return (queries
            .select("*", F.explode(F.array(*structs)).alias("__tb"))
            .withColumn("table", F.col("__tb.table"))
            .withColumn("bucket", F.col("__tb.bucket"))
            .drop("__tb"))


def cosine_topk_lsh_multi(embeddings: DataFrame, queries: DataFrame,
                          plane_sets: List[List[List[float]]],
                          k: int = 5, probe_bits: int = 0,
                          probe_pairs: int = 0) -> DataFrame:
    """Multi-table LSH top-k (the recall-tunable scale path): a corpus
    vector is a candidate when it shares a bucket with the query in ANY of
    the L tables; each candidate pair is scored once (dropDuplicates before
    the cosine). Expected comparisons ≈ L / 2^bits of brute force; recall
    for a neighbor at angle θ is 1 - (1 - (1-θ/π)^bits)^L. Tune (bits, L)
    to the target similarity regime — ``bench.py`` measures both knobs
    against brute force on the benchmark corpus.

    ``probe_bits``/``probe_pairs`` > 0 turn on query-directed multiprobe
    (:func:`hyperplane_probe_codes`): queries also probe the buckets
    reached by flipping their lowest-margin bits, trading ~(1 + probes)×
    candidates for recall on hard (near-orthogonal) regimes — far fewer
    probes than blanket hamming-radius expansion at equal recall. The
    corpus side always stays single-code."""
    emb_c = hyperplane_codes(embeddings, plane_sets)
    q_c = hyperplane_probe_codes(
        queries.select(F.col("q_id").alias("vec_id"),
                       F.col("q_vec").alias("embedding")), plane_sets,
        probe_bits=probe_bits, probe_pairs=probe_pairs) \
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


def gaussian_plane_sets(n_tables: int, n_planes: int, dim: int,
                        seed: int = 7) -> List[List[List[float]]]:
    """Deterministic ORTHONORMALIZED Gaussian hyperplane tables (QR of a
    seeded Gaussian matrix per table). Orthonormal bits within a table are
    (near-)independent fair coins on isotropic data, so buckets stay
    balanced — measured on the bench corpus, the same (recall, comparisons)
    point needs ~2x fewer candidates than the ±1 md5-sign planes (whose
    correlated bits skew bucket occupancy)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    out = []
    for _t in range(n_tables):
        a = rng.standard_normal((dim, n_planes))
        q, _ = np.linalg.qr(a)
        out.append([[float(x) for x in q[:, p]] for p in range(n_planes)])
    return out


def hyperplane_codes_batch(embeddings: DataFrame,
                           plane_sets: List[List[List[float]]],
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Multi-table LSH codes via ONE Arrow kernel: all L x b plane dots as
    a single numpy matmul per batch, bits packed per table, rows exploded
    to (id, table, bucket). Semantically identical to
    :func:`hyperplane_codes`; exists because a Catalyst-expression plan
    with hundreds of 64-element fold expressions (the L x b > ~256 regime
    the high-recall configs need) blows up analysis/codegen time, while
    the matmul is a few ms per batch. Joins/ranking stay JVM-side."""
    import numpy as np
    import pandas as pd
    mat = np.array([p for planes in plane_sets for p in planes],
                   dtype=np.float64)          # (L*b) x dim
    L, b = len(plane_sets), len(plane_sets[0])

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            dots = x @ mat.T                  # n x (L*b)
            bits = (dots >= 0).astype(np.int64).reshape(len(x), L, b)
            codes = (bits << np.arange(b)).sum(axis=2)      # n x L
            n = len(x)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), L),
                "table": np.tile(np.arange(L, dtype=np.int32), n),
                "bucket": codes.reshape(-1)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, table int, bucket long")


def hyperplane_probe_codes_batch(queries: DataFrame,
                                 plane_sets: List[List[List[float]]],
                                 probe_bits: int = 0,
                                 probe_pairs: int = 0,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Query-side multiprobe codes via the same Arrow kernel strategy:
    margin sort + XOR probe set (identical semantics and tie-breaks to
    :func:`hyperplane_probe_codes`), one numpy pass per batch."""
    import numpy as np
    import pandas as pd
    mat = np.array([p for planes in plane_sets for p in planes],
                   dtype=np.float64)
    L, b = len(plane_sets), len(plane_sets[0])
    pair_ix = [(0, 1), (0, 2), (1, 2)][:probe_pairs]
    need = max(probe_bits, 3 if probe_pairs else 0)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(x)
            dots = (x @ mat.T).reshape(n, L, b)
            bits = (dots >= 0).astype(np.int64)
            codes = (bits << np.arange(b)).sum(axis=2)      # n x L
            order = np.argsort(np.abs(dots), axis=2, kind="stable")
            flips = [(np.int64(1) << order[:, :, i])
                     for i in range(min(need, b))]
            probes = [codes]
            probes += [codes ^ flips[i]
                       for i in range(min(probe_bits, len(flips)))]
            probes += [codes ^ flips[i] ^ flips[j]
                       for i, j in pair_ix if j < len(flips)]
            P = len(probes)
            stacked = np.stack(probes, axis=2)              # n x L x P
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), L * P),
                "table": np.tile(np.repeat(np.arange(L, dtype=np.int32), P),
                                 n),
                "bucket": stacked.reshape(-1)})

    return queries.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, table int, bucket long")


def cosine_topk_lsh_batch(embeddings: DataFrame, queries: DataFrame,
                          plane_sets: List[List[List[float]]],
                          k: int = 5, probe_bits: int = 0,
                          probe_pairs: int = 0) -> DataFrame:
    """cosine_topk_lsh_multi with batch (Arrow-kernel) code computation —
    the high-table-count configuration the hard (near-orthogonal) recall
    regime needs. Candidate join, id-only dedupe and cosine ranking are
    unchanged JVM-side plans."""
    emb_c = hyperplane_codes_batch(embeddings, plane_sets)
    q_c = hyperplane_probe_codes_batch(
        queries.select(F.col("q_id").alias("vec_id"),
                       F.col("q_vec").alias("embedding")), plane_sets,
        probe_bits=probe_bits, probe_pairs=probe_pairs) \
        .select(F.col("vec_id").alias("q_id"), "table", "bucket")
    cand_ids = (q_c.join(emb_c.select("vec_id", "table", "bucket"),
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
