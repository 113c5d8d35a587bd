"""Sequence packing: cumsum parity with a single window + span semantics."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from gigaspark.operators.ordering import with_global_cumsum
from gigaspark.operators.packing import pack_blocks


def test_global_cumsum_matches_window(spark):
    df = spark.range(0, 150_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"),
        (F.col("id") % 97 + 1).alias("w"))
    order = [F.col("k").asc()]
    got = with_global_cumsum(df, order, "w", "cum")  # big path
    win = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("cum", F.coalesce(F.sum("w").over(win), F.lit(0)))
    diffs = (got.join(want.withColumnRenamed("cum", "cum2"), ["k", "w"])
             .where(F.col("cum") != F.col("cum2")).count())
    assert diffs == 0
    assert got.count() == 150_000


def test_pack_blocks_spans(spark):
    # 3 docs: 300, 300, 600 tokens; ctx=512.
    # d1: [0,299]    -> blocks 0..0, 1 block
    # d2: [300,599]  -> blocks 0..1, 2 blocks (straddles the boundary)
    # d3: [600,1199] -> blocks 1..2, 2 blocks
    docs = spark.createDataFrame(
        [("d1", "x " * 300), ("d2", "y " * 300), ("d3", "z " * 600),
         ("d0empty", "")],
        "doc_id string, text string")
    rows = {r["doc_id"]: r for r in pack_blocks(docs, ctx=512).collect()}
    assert "d0empty" not in rows  # zero-token docs occupy no positions
    assert (rows["d1"]["start_off"], rows["d1"]["first_block"],
            rows["d1"]["last_block"], rows["d1"]["n_blocks"]) == (0, 0, 0, 1)
    assert (rows["d2"]["start_off"], rows["d2"]["first_block"],
            rows["d2"]["last_block"], rows["d2"]["n_blocks"]) == (300, 0, 1, 2)
    assert (rows["d3"]["start_off"], rows["d3"]["first_block"],
            rows["d3"]["last_block"], rows["d3"]["n_blocks"]) == (600, 1, 2, 2)


def test_pack_blocks_parallelism_invariant(spark):
    docs = spark.range(0, 2_000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id"),
        F.concat(F.lit("w "), F.repeat(F.lit("t "), (F.col("id") % 40).cast("int")))
        .alias("text"))
    a = pack_blocks(docs.repartition(2), ctx=128).orderBy("doc_id").collect()
    b = pack_blocks(docs.repartition(16), ctx=128).orderBy("doc_id").collect()
    assert a == b
