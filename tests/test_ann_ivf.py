"""IVF ANN: deterministic Lloyd training, unique cell assignment, and
nprobe recall behavior vs the brute-force baseline."""

import hashlib

import pytest

from pyspark.sql import functions as F

from simplecrawler_spark.operators.similarity import (
    cosine_topk, cosine_topk_ivf, ivf_assign, ivf_train)

DIM = 16
N = 400


def _vec(i: int):
    h = hashlib.md5(f"v:{i}".encode()).digest()
    return [(b - 127.5) / 127.5 for b in h[:DIM]]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    return df.cache()


def test_ivf_train_deterministic(emb):
    c1 = ivf_train(emb, n_centroids=8, iters=2)
    c2 = ivf_train(emb, n_centroids=8, iters=2)
    assert c1 == c2
    assert len(c1) == 8 and all(len(v) == DIM for _, v in c1)
    # Lloyd moves centroids off the raw seed vectors
    seeds = ivf_train(emb, n_centroids=8, iters=0)
    assert c1 != seeds


def test_ivf_assign_unique_and_total(emb):
    cents = ivf_train(emb, n_centroids=8, iters=1)
    a = ivf_assign(emb, cents)
    assert a.count() == N  # every vector lands in exactly one cell
    cids = {r["cid"] for r in a.select("cid").distinct().collect()}
    assert cids <= set(range(8)) and len(cids) > 1


def test_ivf_recall_grows_with_nprobe(emb):
    cents = ivf_train(emb, n_centroids=8, iters=1)
    q = emb.filter("vec_id % 40 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    truth = {(r["q_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}

    def recall(nprobe):
        got = {(r["q_id"], r["vec_id"])
               for r in cosine_topk_ivf(emb, q, cents, k=5,
                                        nprobe=nprobe).collect()}
        return len(got & truth) / len(truth)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8
    assert r8 == 1.0  # probing every cell IS brute force
    assert r4 >= 0.5  # half the cells already recovers most neighbors
