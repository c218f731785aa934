"""Query-directed multiprobe LSH (operators/similarity.py:
hyperplane_probe_codes / cosine_topk_lsh_multi probe_bits/probe_pairs).

Covers: zero-probe reduction to the single-probe path, the exact probe-set
construction (base + lowest-margin single flips + ordered pair flips, ties
by plane index), candidate-set monotonicity, and recall lift on a planted
near-neighbor whose code differs by exactly one (lowest-margin) bit.
"""

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.operators.similarity import (
    cosine_topk_lsh_multi, hyperplane_codes, hyperplane_probe_codes)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


PLANES_2D = [  # 4 planes over R^2, distinct margins for vector (1, 0.1)
    [1.0, 0.0],     # dot 1.0
    [0.0, 1.0],     # dot 0.1   <- smallest |margin|
    [1.0, 1.0],     # dot 1.1
    [-1.0, 4.0],    # dot -0.6  -> bit 0
]


def test_zero_probes_match_single_probe_codes(spark):
    vecs = _emb(spark, [(0, [1.0, 0.1]), (1, [-0.3, 0.9]),
                        (2, [0.5, -0.5]), (3, [-1.0, -2.0])])
    sets = [PLANES_2D, [[0.3, -0.7], [2.0, 0.5], [-1.0, 0.25]]]
    base = {(r["vec_id"], r["table"], r["bucket"])
            for r in hyperplane_codes(vecs, sets).collect()}
    probed = {(r["vec_id"], r["table"], r["bucket"])
              for r in hyperplane_probe_codes(vecs, sets).collect()}
    assert probed == base


def test_probe_set_construction(spark):
    vecs = _emb(spark, [(0, [1.0, 0.1])])
    rows = hyperplane_probe_codes(vecs, [PLANES_2D],
                                  probe_bits=2, probe_pairs=1).collect()
    got = [r["bucket"] for r in rows]
    # margins: |1.0|, |0.1|, |1.1|, |0.6| -> ascending planes [1, 3, 0, 2]
    base = 0b0111  # bits: p0 +, p1 +, p2 +, p3 -
    assert got == [base,
                   base ^ (1 << 1),              # flip smallest margin
                   base ^ (1 << 3),              # flip 2nd smallest
                   base ^ (1 << 1) ^ (1 << 3)]   # pair (1st, 2nd)


def test_probe_margin_tie_breaks_by_plane_index(spark):
    # planes 0 and 1 have IDENTICAL |dot| for this vector — the probe
    # order must pick the lower plane index first (struct sort tie-break)
    planes = [[1.0, 0.0], [0.0, 1.0], [3.0, 3.0]]
    vecs = _emb(spark, [(0, [0.5, 0.5])])
    rows = hyperplane_probe_codes(vecs, [planes], probe_bits=1).collect()
    base = 0b111
    assert [r["bucket"] for r in rows] == [base, base ^ 1]


def test_candidates_monotone_and_recall_lift(spark):
    import hashlib

    def planes_of(t, n_planes, dim):
        out = []
        for p in range(n_planes):
            h = hashlib.md5(f"t:{t}:p:{p}".encode()).digest() * 4
            out.append([1.0 if h[i] & 1 else -1.0 for i in range(dim)])
        return out

    dim, n = 16, 400
    sets = [planes_of(t, 8, dim) for t in range(2)]

    def vec(i):
        h = hashlib.md5(f"v:{i}".encode()).digest() * 4
        return [(h[j] % 17) - 8.0 for j in range(dim)]

    rows = [(i, vec(i)) for i in range(n)]
    emb = _emb(spark, rows)
    q = (emb.filter("vec_id % 50 = 0")
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))

    def cands(pb, pp):
        got = cosine_topk_lsh_multi(emb, q, sets, k=400,
                                    probe_bits=pb, probe_pairs=pp)
        return {(r["q_id"], r["vec_id"]) for r in got.collect()}

    c0, c2, c22 = cands(0, 0), cands(2, 0), cands(2, 2)
    assert c0 <= c2 <= c22, "probing must only ADD candidates"
    assert len(c22) > len(c0), "probes must actually widen the net"

def test_batch_codes_match_expression_path(spark):
    """The Arrow-kernel code path (numpy matmul) must emit EXACTLY the
    (id, table, bucket) rows of the Catalyst-expression path, probes
    included — same margins, same tie-breaks."""
    from simplecrawler_spark.operators.similarity import (
        gaussian_plane_sets, hyperplane_codes_batch,
        hyperplane_probe_codes_batch)
    import hashlib

    def vec(i, dim=16):
        h = hashlib.md5(f"bv:{i}".encode()).digest() * 4
        return [(h[j] % 19) - 9.0 for j in range(dim)]

    vecs = _emb(spark, [(i, vec(i)) for i in range(120)])
    sets = gaussian_plane_sets(3, 6, 16, seed=11)

    expr = {(r["vec_id"], r["table"], r["bucket"])
            for r in hyperplane_codes(vecs, sets).collect()}
    batch = {(r["vec_id"], r["table"], r["bucket"])
             for r in hyperplane_codes_batch(vecs, sets).collect()}
    assert batch == expr

    e2 = {(r["vec_id"], r["table"], r["bucket"])
          for r in hyperplane_probe_codes(vecs, sets, probe_bits=2,
                                          probe_pairs=2).collect()}
    b2 = {(r["vec_id"], r["table"], r["bucket"])
          for r in hyperplane_probe_codes_batch(vecs, sets, probe_bits=2,
                                                probe_pairs=2).collect()}
    assert b2 == e2


def test_batch_topk_matches_expression_topk(spark):
    from simplecrawler_spark.operators.similarity import (
        cosine_topk_lsh_batch, gaussian_plane_sets)
    import hashlib

    def vec(i, dim=16):
        h = hashlib.md5(f"tv:{i}".encode()).digest() * 4
        return [(h[j] % 19) - 9.0 for j in range(dim)]

    vecs = _emb(spark, [(i, vec(i)) for i in range(200)])
    q = (vecs.filter("vec_id % 40 = 0")
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    sets = gaussian_plane_sets(3, 5, 16, seed=13)
    a = {(r["q_id"], r["vec_id"], r["rank"]) for r in
         cosine_topk_lsh_multi(vecs, q, sets, k=5, probe_bits=2,
                               probe_pairs=1).collect()}
    b = {(r["q_id"], r["vec_id"], r["rank"]) for r in
         cosine_topk_lsh_batch(vecs, q, sets, k=5, probe_bits=2,
                               probe_pairs=1).collect()}
    assert a == b
