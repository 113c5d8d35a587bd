"""Streaming index maintenance (Msg4 add stream → LSM postings):
micro-batched doc versions fold into latest-generation-wins postings;
the resolved index equals the batch reindex of the same versions, and
compaction changes nothing observable."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gigaspark.operators.search import build_postings, latest_doc_versions
from gigaspark.streaming.index_stream import StreamingIndex

VERS_SCHEMA = "doc_id long, gen int, deleted boolean, text string"

B0 = [(1, 0, False, "the quick brown fox"),
      (2, 0, False, "lazy dog sleeps"),
      (3, 0, False, "old text of three")]
B1 = [(3, 1, False, "new text of three entirely"),   # re-spider update
      (4, 1, False, "fresh page four")]
B2 = [(2, 2, True, ""),                              # delete doc 2
      (5, 2, False, "late page five"),
      (4, 2, False, "page four revised"),
      (4, 2, True, "")]                              # tombstone ties win


def _expected(spark):
    allv = spark.createDataFrame(B0 + B1 + B2, VERS_SCHEMA)
    return {(r["term"], r["doc_id"], r["pos"])
            for r in build_postings(latest_doc_versions(allv)).collect()}


def _got(idx):
    return {(r["term"], r["doc_id"], r["pos"])
            for r in idx.live_postings().collect()}


def test_streaming_index_equals_batch_reindex(spark, tmp_path):
    idx = StreamingIndex(spark, str(tmp_path / "idx"))
    for i, rows in enumerate([B0, B1, B2]):
        idx.absorb_batch(spark.createDataFrame(rows, VERS_SCHEMA), i)
    want = _expected(spark)
    assert _got(idx) == want
    # docs 1,3(gen1),5 alive; 2 deleted; 4 tombstoned at its max gen
    live_docs = {d for _, d, _ in _got(idx)}
    assert live_docs == {1, 3, 5}
    # replaying a batch (foreachBatch at-least-once) changes nothing
    idx.absorb_batch(spark.createDataFrame(B1, VERS_SCHEMA), 1)
    assert _got(idx) == want
    # compaction is observation-equivalent ...
    idx.compact()
    assert _got(idx) == want
    # ... keeps tombstones (late lower-gen add cannot resurrect) ...
    idx.absorb_batch(spark.createDataFrame(
        [(2, 1, False, "stale resurrection attempt")], VERS_SCHEMA), 99)
    assert _got(idx) == want
    # ... and a genuinely newer generation still lands
    idx.absorb_batch(spark.createDataFrame(
        [(2, 3, False, "two reborn")], VERS_SCHEMA), 100)
    assert {d for _, d, _ in _got(idx)} == {1, 2, 3, 5}


def test_streaming_index_through_writestream(spark, tmp_path):
    """The real Structured Streaming path: file source → foreachBatch."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    idx = StreamingIndex(spark, str(tmp_path / "idx"))
    for rows in [B0, B1, B2]:
        spark.createDataFrame(rows, VERS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = spark.readStream.schema(VERS_SCHEMA).parquet(src)
    q = (stream.writeStream.foreachBatch(idx.sink())
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _got(idx) == _expected(spark)


def test_compact_commits_atomically(spark, tmp_path):
    """compact() serves the OLD generation until the pointer commit:
    a half-written new generation (crash simulation) is invisible, a
    second compact after more batches still resolves, and old dirs are
    GC'd only after the swap."""
    root = str(tmp_path / "idx")
    idx = StreamingIndex(spark, root)
    for i, rows in enumerate([B0, B1]):
        idx.absorb_batch(spark.createDataFrame(rows, VERS_SCHEMA), i)
    before = _got(idx)
    # crash simulation: an orphaned half-written next-gen dir must not
    # change what reads see (pointer still names the old generation)
    os.makedirs(os.path.join(root, "postings_parts.g1"), exist_ok=True)
    with open(os.path.join(root, "postings_parts.g1", "junk.bin"), "wb") as fh:
        fh.write(b"\x00not-parquet")
    assert idx.parts_dir.endswith("postings_parts")
    assert _got(idx) == before
    idx.compact()
    assert idx.parts_dir.endswith(".g1")
    assert _got(idx) == before
    # old generation GC'd after the commit
    assert not os.path.exists(os.path.join(root, "postings_parts"))
    assert not os.path.exists(os.path.join(root, "version_manifest"))
    # keeps absorbing + a second compact advances the pointer again
    idx.absorb_batch(spark.createDataFrame(B2, VERS_SCHEMA), 2)
    idx.compact()
    assert idx.parts_dir.endswith(".g2")
    assert _got(idx) == _expected(spark)
