"""Rendezvous sharding + largest-remainder budget laws."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def _assign(spark, hosts, n_shards):
    """Pure-python rendezvous mirror for property checks."""
    import hashlib

    def shard(h):
        return max(range(n_shards),
                   key=lambda s: (int(hashlib.md5(
                       f"{h}#{s}".encode()).hexdigest()[:8], 16), -s))
    return {h: shard(h) for h in hosts}


def test_rendezvous_minimal_remapping():
    """Dropping one shard only moves the hosts that were ON it; all
    other assignments are untouched (the consistent-hashing property
    plain mod-N sharding lacks)."""
    hosts = [f"host{i}.example" for i in range(300)]
    a16 = _assign(None, hosts, 16)
    # remove shard 15 == rendezvous over shards 0..14
    a15 = _assign(None, hosts, 15)
    moved = [h for h in hosts if a16[h] != a15[h]]
    assert all(a16[h] == 15 for h in moved)          # only shard-15 hosts move
    assert any(a16[h] == 15 for h in hosts)          # non-vacuous
    # mod-N control: most hosts move
    mod_moved = sum(1 for i in range(300) if i % 16 != i % 15)
    assert mod_moved > 250


def test_rendezvous_spark_matches_mirror(spark):
    import __spark_entry__ as E

    rows = E.queries()["host_shard_rendezvous"](
        spark, "/root/testdata/sf0.001").collect()
    got = {r["host"]: r["shard"] for r in rows}
    want = _assign(None, list(got), 16)
    assert got == want
    # every shard's reported load equals the actual count
    from collections import Counter
    loads = Counter(got.values())
    for r in rows:
        assert r["shard_load"] == loads[r["shard"]]


def test_budget_largest_remainder_exact(spark):
    """Budgets sum EXACTLY to the global budget and are within 1 of the
    proportional share (the Hamilton-method guarantees)."""
    import __spark_entry__ as E

    rows = E.queries()["crawl_budget_allocation"](
        spark, "/root/testdata/sf0.001").collect()
    total_rank = sum(r["rank"] for r in rows)
    assert sum(r["budget"] for r in rows) == 100_000
    for r in rows:
        exact = r["rank"] * 100_000 / total_rank
        assert abs(r["budget"] - exact) < 1.0 + 1e-9


def test_hll_accuracy_and_merge(spark):
    """The pinned HLL lands within ~3 standard errors (64 registers →
    13%) of the exact distinct count, duplicates don't move it, and
    register tables merge by element-wise max (sketch associativity)."""
    from pyspark.sql import functions as F

    from gigaspark.operators.sketch import (hll_count_distinct,
                                            hll_estimate, hll_registers)

    n = 5000
    rows = [("k", f"item-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "key string, item string")
    est = hll_count_distinct(df, "key", "item").collect()[0]["estimate"]
    assert abs(est - n) / n < 0.4  # 3σ at m=64 ≈ 0.39

    # duplicates are invisible to the sketch
    dup = df.unionByName(df)
    est2 = hll_count_distinct(dup, "key", "item").collect()[0]["estimate"]
    assert est2 == est

    # split-merge equals whole: max-merge two half sketches
    h1 = hll_registers(df.limit(2500), "key", "item")
    h2 = hll_registers(df.subtract(df.limit(2500)), "key", "item")
    merged = (h1.unionByName(h2).groupBy("key", "bucket")
              .agg(F.max("register").alias("register")))
    est3 = hll_estimate(merged).collect()[0]["estimate"]
    assert est3 == est


def test_hll_small_range_linear_counting(spark):
    """Tiny sets route through linear counting and stay near-exact."""
    from gigaspark.operators.sketch import hll_count_distinct

    df = spark.createDataFrame([("k", f"x{i}") for i in range(20)],
                               "key string, item string")
    est = hll_count_distinct(df, "key", "item").collect()[0]["estimate"]
    # LC standard error at m=64, n=20 allows a few units of slack
    assert abs(est - 20) <= 7


def test_cm_sketch_guarantee_and_merge(spark):
    """CM estimates never undercount, are exact when collisions are
    absent, and sketches merge by cell-wise sum."""
    from pyspark.sql import functions as F

    from gigaspark.operators.sketch import cm_estimate, cm_sketch

    rows = ([("hot",)] * 500 + [("warm",)] * 50
            + [(f"cold{i}",) for i in range(200)])
    df = spark.createDataFrame(rows, "term string")
    sk = cm_sketch(df, "term")
    q = spark.createDataFrame([("hot",), ("warm",), ("cold0",)],
                              "term string")
    got = {r["key"]: r["estimate"]
           for r in cm_estimate(sk, q, "term").collect()}
    assert got["hot"] >= 500 and got["warm"] >= 50 and got["cold0"] >= 1
    # 750 items in 4x256 cells → expected collision inflation is tiny
    assert got["hot"] <= 520 and got["warm"] <= 70

    # split-merge equality: sum-merge two half sketches (explicit
    # halves — DataFrame limit/except are set-ish and drop duplicates)
    half1 = spark.createDataFrame(rows[:375], "term string")
    half2 = spark.createDataFrame(rows[375:], "term string")
    m = (cm_sketch(half1, "term").unionByName(cm_sketch(half2, "term"))
         .groupBy("row", "bucket").agg(F.sum("cell").alias("cell")))
    got2 = {r["key"]: r["estimate"]
            for r in cm_estimate(m, q, "term").collect()}
    assert got2 == got
