"""Skew tournament (SURVEY §4.4): result-equality with the direct window
under megahost skew, and a tournament-enabled frontier round matching a
plain one."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler
from gigaspark.operators.skew import topk_per_key, tournament_prune
from gigaspark.synth import SynthParams, gen_all
from tests.conftest import load_fixtures


@pytest.fixture(scope="module")
def skewed(spark):
    # one megahost (key 0) with 50k rows, 99 normal keys with ~50 each
    big = spark.range(50_000).select(
        F.lit(0).alias("k"), F.col("id").alias("v"),
        F.xxhash64("id").alias("salt_key"))
    small = spark.range(5_000).select(
        (F.col("id") % 99 + 1).cast("long").alias("k"),
        F.col("id").alias("v"), F.xxhash64("id", F.lit(1)).alias("salt_key"))
    return big.unionByName(small)


def test_topk_matches_direct_window(skewed):
    order = [F.col("v").desc()]
    for k in (1, 3):
        got = topk_per_key(skewed, ["k"], order, k, "salt_key", n_salts=16)
        w = Window.partitionBy("k").orderBy(*order)
        want = (skewed.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k))
        assert got.select("k", "v", "rn").exceptAll(
            want.select("k", "v", "rn")).count() == 0
        assert want.select("k", "v", "rn").exceptAll(
            got.select("k", "v", "rn")).count() == 0


def test_prune_bounds_partition_size(skewed):
    pruned = tournament_prune(skewed, ["k"], [F.col("v").desc()], 3,
                              "salt_key", n_salts=16)
    per_key = pruned.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    assert per_key <= 16 * 3  # ≤ S·k_max survivors per key


def test_frontier_round_with_tournament(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewuni"))
    gen_all(d, SynthParams(n_hosts=30, pages_lo=3, pages_hi=6, mega_hosts=2,
                           mega_share=0.5, n_seed_hosts=30, n_images=30,
                           out_degree_hi=3))
    fx = load_fixtures(spark, d)
    seeds = spark.read.parquet(f"{d}/seeds.parquet")

    plain = CrawlScheduler(spark, fx)
    plain.seed(seeds)
    plain.run_round()
    plain.run_round()
    a = [(r["seq"], r["urlhash48"], r["scheduled_time_ms"]) for r in
         plain.emitted_df().orderBy("seq").collect()]

    tourn = CrawlScheduler(spark, fx, CrawlConfig(tournament_salts=8))
    tourn.seed(seeds)
    tourn.run_round()
    tourn.run_round()
    b = [(r["seq"], r["urlhash48"], r["scheduled_time_ms"]) for r in
         tourn.emitted_df().orderBy("seq").collect()]
    assert a == b and len(a) > 0
