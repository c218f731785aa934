"""Grid-tune the IVF ANN config on the bench corpus.

Target (VERDICT r04 #5): raw-regime recall@5 >= 0.7 at a comparison
upper bound <= 0.35 of brute force on the sf0.1 embeddings.

Usage: python BENCH/tune_ivf.py [sf_dir]
Prints one line per (n_centroids, iters, nprobe) combo.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    from pyspark.sql import functions as F
    from simplecrawler_spark.operators.similarity import (
        cosine_topk, cosine_topk_ivf, ivf_assign, ivf_train)
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
        # (n_centroids, iters, nprobe)
        (16, 2, 4),    # r04 headline: 0.61 @ 0.274
        (16, 2, 5),
        (16, 5, 5),
        (32, 2, 8),
        (32, 5, 8),
        (32, 5, 10),
        (64, 3, 16),
        (64, 5, 16),
        (64, 5, 20),
        (128, 4, 32),
        (128, 4, 40),
    ]
    for (nc, iters, nprobe) in grid:
        t0 = time.time()
        cents = ivf_train(emb, n_centroids=nc, iters=iters)
        t_train = time.time() - t0
        t0 = time.time()
        got = pairs(cosine_topk_ivf(emb, q, cents, k=5, nprobe=nprobe))
        t_q = time.time() - t0
        recall = len(got & truth) / max(len(truth), 1)
        sizes = sorted((r["n"] for r in
                        ivf_assign(emb, cents).groupBy("cid")
                        .agg(F.count("*").alias("n")).collect()),
                       reverse=True)
        comp_ub = sum(sizes[:nprobe]) / max(n - 1, 1)
        print(f"nc={nc:4d} iters={iters} nprobe={nprobe:3d} "
              f"recall@5={recall:.3f} comp_ub={comp_ub:.3f} "
              f"cells={len(sizes)} max_cell={sizes[0]} "
              f"train={t_train:.1f}s query={t_q:.1f}s", flush=True)


if __name__ == "__main__":
    main()
