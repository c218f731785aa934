"""Politeness + skew (SURVEY §7 item 5, north_rule token bucket).

A hot domain holding 50% of the frontier must (a) be budget-capped per
wave in FIFO order and (b) not concentrate the fetch-stage work in one
task — the salted (host_bucket, id) repartition spreads a single host's
rows across partitions."""

from pyspark.sql import functions as F

from simplecrawler_spark.operators.politeness import (DEFAULT_RANK_SALT,
                                                      select_due)


def _skewed_frontier(spark, n=10_000, buckets=64):
    # host 'hot.test' carries half the rows; 50 cold hosts share the rest
    return (spark.range(n)
            .select(F.col("id"),
                    F.when(F.col("id") % 2 == 0, F.lit("hot.test"))
                    .otherwise(F.concat(F.lit("cold"),
                                        (F.col("id") % 50).cast("string"),
                                        F.lit(".test"))).alias("host"),
                    F.lit("queued").alias("status"))
            .withColumn("host_bucket",
                        (F.abs(F.xxhash64("host")) % buckets).cast("int")))


def test_budget_caps_hot_host_fifo(spark):
    frontier = _skewed_frontier(spark)
    due = select_due(frontier, tokens_per_host=100).cache()
    per_host = {r["host"]: r["n"] for r in
                due.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["hot.test"] == 100        # capped
    assert all(v == 100 for v in per_host.values())  # cold hosts have >=100 too
    # FIFO: the selected hot rows are exactly the 100 smallest hot ids
    hot_ids = sorted(r["id"] for r in
                     due.filter("host = 'hot.test'").collect())
    assert hot_ids == list(range(0, 200, 2))
    due.unpersist()


def test_unlimited_budget_returns_all_queued(spark):
    frontier = _skewed_frontier(spark, n=1_000)
    mixed = frontier.withColumn(
        "status", F.when(F.col("id") % 10 == 0, "downloaded")
        .otherwise("queued"))
    assert select_due(mixed, None).count() == 900


def test_ranking_stage_skew_safe(spark):
    """The RANKING stage itself (not just the fetch stage) must not sort a
    hot host in one task: phase 1 of the two-phase top-k partitions by
    (host, id % salt), so a host holding 50% of a large frontier spreads
    over `salt` sort groups. Asserted on the pre-cut exchange layout via
    spark_partition_id, plus exactness of the selected FIFO heads."""
    n, tokens = 4_000_000, 256
    frontier = _skewed_frontier(spark, n=n)
    due = select_due(frontier, tokens_per_host=tokens).cache()
    per_host = {r["host"]: r["n"] for r in
                due.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["hot.test"] == tokens
    assert all(v == tokens for v in per_host.values())
    # exact FIFO heads: hot rows are the even ids, so its budget is the
    # first `tokens` evens; cold host k holds ids ≡ k (mod 50) among odds
    hot_ids = sorted(r["id"] for r in
                     due.filter("host = 'hot.test'").collect())
    assert hot_ids == list(range(0, 2 * tokens, 2))
    due.unpersist()

    # pre-cut exchange layout of phase 1: same hash-partitioning exprs the
    # ranking window uses — no task may see >2x the mean row count even
    # though one host owns half the frontier
    parts = (frontier.filter("status = 'queued'")
             .repartition(32, "host", F.pmod(F.xxhash64(F.col("id")),
                                             F.lit(DEFAULT_RANK_SALT)))
             .withColumn("__pid", F.spark_partition_id())
             .groupBy("__pid").agg(
                 F.count("*").alias("n"),
                 F.sum(F.when(F.col("host") == "hot.test", 1).otherwise(0))
                 .alias("hot_n"))
             .collect())
    sizes = [r["n"] for r in parts]
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))
    # the hot host's rows are genuinely split across sort groups
    hot = [r["hot_n"] for r in parts if r["hot_n"]]
    assert max(hot) <= 0.25 * sum(hot)


def test_salted_repartition_balances_hot_host(spark):
    frontier = _skewed_frontier(spark)
    due = select_due(frontier, tokens_per_host=None)
    # the fetch-stage layout used by WaveCrawler._due_distributed_path
    parts = (due.repartition(32, "host_bucket", "id")
             .withColumn("__pid", F.spark_partition_id())
             .groupBy("__pid").agg(
                 F.count("*").alias("n"),
                 F.sum(F.when(F.col("host") == "hot.test", 1).otherwise(0))
                 .alias("hot_n"))
             .collect())
    sizes = [r["n"] for r in parts]
    hot = [r["hot_n"] for r in parts]
    assert len(sizes) > 16                    # actually spread out
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))  # balanced tasks
    # the hot host itself is spread, not parked in one partition
    assert max(hot) <= 0.25 * sum(hot)

    # contrast: partitioning by host_bucket alone parks 50% in one task
    bad = (due.repartition(32, "host_bucket")
           .withColumn("__pid", F.spark_partition_id())
           .groupBy("__pid").agg(
               F.sum(F.when(F.col("host") == "hot.test", 1).otherwise(0))
               .alias("hot_n")).collect())
    assert max(r["hot_n"] for r in bad) == sum(r["hot_n"] for r in bad)
