"""Streaming trap detector: stream↔batch parity + replay safety."""

from __future__ import annotations

import time

from gigaspark.operators.url_filters import trap_templates
from gigaspark.streaming.trap_stream import StreamingTrapDetector


def _urls(n0, n1):
    return ([(f"http://t.example/cal/{i}/{i % 7}",) for i in range(n0, n1)]
            + [(f"http://t.example/about",)]
            + [(f"http://s.example/p/{i}",) for i in range(n0, n1)])


def _traps(df):
    return {(r["host"], r["template"]): (r["n_urls"], r["is_trap"])
            for r in df.collect()}


def test_stream_batch_parity_and_replay(spark, tmp_path):
    det = StreamingTrapDetector(spark, str(tmp_path / "traps"))
    b0 = spark.createDataFrame(_urls(0, 15), "url string")
    b1 = spark.createDataFrame(_urls(15, 30), "url string")
    det.absorb_batch(b0, 0)
    det.absorb_batch(b1, 1)
    # batch-side truth over the distinct union ('about' repeats across
    # batches — the stream contract assumes upstream URL-seen dedup, so
    # feed the union's distinct set to the batch operator)
    union = b0.unionByName(b1).distinct()
    want = _traps(trap_templates(union, min_urls=20))
    got = _traps(det.current_traps(min_urls=20))
    # '/about' appears once per batch upstream-deduped? It repeats →
    # counts differ only for that static template; compare trap rows
    # and variable templates exactly
    assert got[("t.example", "/cal/*/*")] == want[("t.example", "/cal/*/*")]
    assert got[("s.example", "/p/*")] == want[("s.example", "/p/*")]
    assert got[("t.example", "/cal/*/*")][1] is True
    assert got[("s.example", "/p/*")] == (30, True)
    assert got[("t.example", "/about")][1] is False
    # replaying batch 1 (at-least-once foreachBatch) changes nothing
    before = _traps(det.current_traps(min_urls=20))
    det.absorb_batch(b1, 1)
    assert _traps(det.current_traps(min_urls=20)) == before


def test_trap_stream_through_writestream(spark, tmp_path):
    """The real Structured Streaming path: file source → foreachBatch."""
    src = str(tmp_path / "src")
    spark.createDataFrame(_urls(0, 25), "url string").write.parquet(src)
    det = StreamingTrapDetector(spark, str(tmp_path / "traps"))
    stream = spark.readStream.schema("url string").parquet(src)
    q = (stream.writeStream.foreachBatch(det.sink())
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    time.sleep(0.2)
    got = _traps(det.current_traps(min_urls=20))
    assert got[("t.example", "/cal/*/*")][1] is True
    assert got[("s.example", "/p/*")] == (25, True)
