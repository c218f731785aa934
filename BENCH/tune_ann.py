"""Grid-tune the multi-table LSH multiprobe config on the bench corpus.

Target (VERDICT r03 #5): raw-regime recall@5 >= 0.6 at <= 0.15 of
brute-force comparisons on the sf0.1 embeddings.

Usage: python BENCH/tune_ann.py [sf_dir]
Prints one line per (tables, bits, probe_bits, probe_pairs) combo.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from __spark_entry__ import _plane_sets


def main():
    from pyspark.sql import functions as F
    from simplecrawler_spark.operators.similarity import (
        cosine_topk, cosine_topk_lsh_multi, hyperplane_codes,
        hyperplane_probe_codes)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    spark = bench.make_session(bench.CPUS)
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.transform("embedding",
                                         lambda x: x.cast("double"))
                   .alias("embedding")).persist())
    n = emb.count()
    q = emb.filter("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    n_q = q.count()

    def pairs(df):
        return {(r["q_id"], r["vec_id"]) for r in
                df.select("q_id", "vec_id").collect()}

    truth = pairs(cosine_topk(emb, q, k=5))
    print(f"n={n} n_q={n_q} truth={len(truth)}", flush=True)

    grid = [
        # (tables, bits, probe_bits, probe_pairs)
        (8, 7, 0, 0),     # current headline (baseline)
        (8, 10, 3, 1),
        (8, 10, 4, 2),
        (8, 12, 4, 3),
        (12, 10, 3, 1),
        (12, 12, 4, 2),
        (16, 12, 4, 3),
        (8, 12, 6, 3),
        (16, 14, 5, 3),
    ]
    for (L, b, pb, pp) in grid:
        ps = _plane_sets(n_tables=L, n_planes=b)
        t0 = time.time()
        got = pairs(cosine_topk_lsh_multi(emb, q, ps, k=5,
                                          probe_bits=pb, probe_pairs=pp))
        recall = len(got & truth) / max(len(truth), 1)
        codes = hyperplane_codes(emb, ps)
        qc = hyperplane_probe_codes(
            q.select(F.col("q_id").alias("vec_id"),
                     F.col("q_vec").alias("embedding")), ps,
            probe_bits=pb, probe_pairs=pp) \
            .select(F.col("vec_id").alias("q_id"), "table", "bucket")
        ncand = (qc.join(codes.select("vec_id", "table", "bucket"),
                         ["table", "bucket"])
                 .filter(F.col("q_id") != F.col("vec_id"))
                 .select("q_id", "vec_id").distinct().count())
        comp = ncand / max(n_q * (n - 1), 1)
        ok = "OK " if (recall >= 0.6 and comp <= 0.15) else "   "
        print(f"{ok}L={L:2d} bits={b:2d} pb={pb} pp={pp} "
              f"recall={recall:.3f} comp={comp:.4f} "
              f"sec={time.time()-t0:.1f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
