"""S10 export sinks (PageResults.cpp XML/JSON serps + PageCrawlBot.cpp
CSV/JSON crawl dumps [U][M]): the Spark mapping is plain `df.write` —
this test pins the round-trip contract (schema + values survive both
formats) so the row stops being 'untested' in COVERAGE.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _schedule(spark):
    return spark.createDataFrame(
        [(i, f"http://h{i % 3}.example/p/{i}", i % 3, 80 - (i % 5), i * 250)
         for i in range(40)],
        "seq long, url string, firstip int, priority int, scheduled_time_ms long")


def test_json_export_roundtrip(spark, tmp_path):
    out = str(tmp_path / "dump_json")
    df = _schedule(spark)
    df.coalesce(1).write.json(out)
    back = spark.read.json(out)
    assert back.count() == 40
    a = {r.seq: (r.url, r.firstip, r.priority, r.scheduled_time_ms)
         for r in df.collect()}
    b = {r.seq: (r.url, int(r.firstip), int(r.priority),
                 int(r.scheduled_time_ms)) for r in back.collect()}
    assert a == b


def test_csv_export_roundtrip(spark, tmp_path):
    out = str(tmp_path / "dump_csv")
    df = _schedule(spark)
    df.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).schema(df.schema).csv(out)
    assert back.orderBy("seq").collect() == df.orderBy("seq").collect()


def test_export_partitioned_by_priority(spark, tmp_path):
    """Crawlbot-style dump bucketed by priority (one dir per bucket) —
    partition pruning on read-back touches only the requested bucket."""
    out = str(tmp_path / "dump_part")
    _schedule(spark).write.partitionBy("priority").parquet(out)
    one = spark.read.parquet(out).where(F.col("priority") == 78)
    rows = one.collect()
    assert rows and all(r.priority == 78 for r in rows)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(priority" in plan or \
           "priority#" in plan  # pruned partition filter present
