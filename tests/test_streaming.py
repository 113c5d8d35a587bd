"""Streaming frontier (ST1): invariants under micro-batch execution —
politeness gaps per host, priority order within a batch, exactly-once
emission across batches (stateful dedup)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from gigaspark.streaming.frontier_stream import streaming_schedule

PREP_SCHEMA = (
    "firstip int, urlhash48 long, url string, priority int, hopcount int,"
    " added_ms long, same_ip_wait_ms long, max_spiders_per_ip int,"
    " crawl_delay_ms long"
)


def _mk_batch(rows):
    return rows


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    chk = str(tmp_path / "chk")

    def write_batch(rows, name):
        spark.createDataFrame(rows, PREP_SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)

    stream = spark.readStream.schema(PREP_SCHEMA).parquet(src)
    out = streaming_schedule(stream, fetch_ms=100)
    q = (out.writeStream.format("memory").queryName("sched")
         .option("checkpointLocation", chk).outputMode("append").start())
    yield write_batch, q
    q.stop()


def test_streaming_invariants(spark, stream_env):
    write_batch, q = stream_env
    # batch 1: two hosts; host 1 has 3 urls (k=2), host 2 has 1
    write_batch(
        [(1, 11, "http://a/1", 80, 0, 0, 100, 2, 0),
         (1, 12, "http://a/2", 50, 1, 1, 100, 2, 0),
         (1, 13, "http://a/3", 90, 2, 2, 100, 2, 500),
         (2, 21, "http://b/1", 50, 0, 0, 0, 1, 1000)], "b1")
    q.processAllAvailable()
    # batch 2: re-send a seen url (12) + a new one
    write_batch(
        [(1, 12, "http://a/2", 50, 1, 1, 100, 2, 0),
         (1, 14, "http://a/4", 10, 3, 3, 100, 2, 0),
         (2, 22, "http://b/2", 60, 1, 4, 0, 1, 1000)], "b2")
    q.processAllAvailable()

    rows = spark.sql("select * from sched order by firstip, scheduled_time_ms").collect()
    emitted = [(r["firstip"], r["urlhash48"]) for r in rows]
    # exactly-once: urlhash 12 emitted at most once despite re-send
    assert emitted.count((1, 12)) <= 1
    assert len(emitted) == len(set(emitted))
    # priority order: host 1's first batch drained 13 (prio 90) then 11 (80)
    h1 = [r for r in rows if r["firstip"] == 1]
    first_two = sorted(h1, key=lambda r: r["scheduled_time_ms"])[:2]
    assert [r["urlhash48"] for r in first_two] == [13, 11]
    # politeness: consecutive slots within one host+batch ≥ fetch+max(wait,delay)
    by_host = {}
    for r in rows:
        by_host.setdefault(r["firstip"], []).append(r)
    for ip, rs in by_host.items():
        rs.sort(key=lambda r: r["scheduled_time_ms"])
        for a, b in zip(rs, rs[1:]):
            if a["batch_seq"] < b["batch_seq"]:  # same drain burst
                assert b["scheduled_time_ms"] - a["scheduled_time_ms"] >= 100
