"""Stratified sampling: pure-function membership, rates, reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from gigaspark.operators.sampling import sample_hash_col, stratified_sample


def _docs(spark, n=4_000):
    # deterministic corpus with two recognizable strata: English-ish and
    # non-word junk (langid -> 'und')
    return spark.range(0, n).select(
        F.format_string("doc%06d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 2 == 0,
               F.lit("the quick brown fox and the lazy dog that was with it"))
        .otherwise(F.lit("zzz qqq xxx kkk vvv www yyy jjj"))
        .alias("text"))


def test_membership_is_pure_function_of_key(spark):
    docs = _docs(spark)
    rates = spark.createDataFrame([("en", 300), ("und", 700)],
                                  "stratum string, permille int")
    a = {r["doc_id"] for r in
         stratified_sample(docs.repartition(3), rates).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(17), rates).collect()}
    assert a == b and len(a) > 0


def test_rates_approximately_hold(spark):
    docs = _docs(spark, 10_000)
    rates = spark.createDataFrame([("en", 100), ("und", 500)],
                                  "stratum string, permille int")
    kept = stratified_sample(docs, rates).groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in kept}
    # 5000 docs per stratum; md5 buckets are uniform -> ~500 and ~2500
    assert abs(counts.get("en", 0) - 500) < 120
    assert abs(counts.get("und", 0) - 2500) < 250


def test_hash_bucket_range_and_salt(spark):
    df = spark.range(0, 1_000).select(F.col("id").cast("string").alias("k"))
    buckets = df.select(sample_hash_col(F.col("k")).alias("b"),
                        sample_hash_col(F.col("k"), "other").alias("b2"))
    agg = buckets.agg(F.min("b"), F.max("b"),
                      F.sum((F.col("b") != F.col("b2")).cast("int"))).collect()[0]
    assert agg[0] >= 0 and agg[1] < 1000
    assert agg[2] > 900  # different salt -> (almost surely) different buckets


def test_weighted_repeat_counts(spark):
    from gigaspark.operators.sampling import repeat_weighted

    docs = _docs(spark, 4_000)  # 2000 'en', 2000 'und'
    weights = spark.createDataFrame([("en", 2250), ("und", 400)],
                                    "stratum string, w_permille int")
    out = repeat_weighted(docs, weights)
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    # en: 2000 docs x 2.25 expected ~4500; und: 2000 x 0.4 ~800
    assert abs(counts["en"] - 4500) < 200
    assert abs(counts["und"] - 800) < 150
    # copy_idx dense per doc: max(copy_idx)+1 == per-doc count
    bad = (out.groupBy("doc_id")
           .agg(F.count("*").alias("n"), (F.max("copy_idx") + 1).alias("m"))
           .where(F.col("n") != F.col("m")).count())
    assert bad == 0


def test_weighted_repeat_parallelism_invariant(spark):
    from gigaspark.operators.sampling import repeat_weighted

    docs = _docs(spark, 1_000)
    weights = spark.createDataFrame([("en", 1500), ("und", 700)],
                                    "stratum string, w_permille int")
    a = sorted(map(tuple, repeat_weighted(docs.repartition(2), weights).collect()))
    b = sorted(map(tuple, repeat_weighted(docs.repartition(13), weights).collect()))
    assert a == b
