"""with_global_seq: parallel dense global sequence == single-window truth."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from gigaspark.operators.ordering import with_global_seq


def test_global_seq_matches_window(spark):
    df = spark.range(0, 150_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"),
        F.col("id").alias("v"))
    order = [F.col("k").asc(), F.col("v").desc()]
    got = with_global_seq(df, order, "seq")  # big path (150k > threshold)
    want = df.withColumn("seq", F.row_number().over(Window.orderBy(*order)) - 1)
    assert got.count() == 150_000
    diffs = got.join(want, ["k", "v"]).where(
        got["seq"] != want["seq"]).count()
    assert diffs == 0
    # dense + 0-based
    agg = got.agg(F.min("seq"), F.max("seq"), F.countDistinct("seq")).collect()[0]
    assert agg[0] == 0 and agg[1] == 149_999 and agg[2] == 150_000


def test_global_seq_small_path(spark):
    df = spark.range(0, 500).select(F.col("id").alias("v"))
    got = with_global_seq(df, [F.col("v").desc()], "seq", small_count=500)
    rows = {r["v"]: r["seq"] for r in got.collect()}
    assert rows[499] == 0 and rows[0] == 499
