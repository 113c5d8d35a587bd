"""Streaming shard packer: micro-batched image ingest → filter →
webdataset byte-stream assignment with a carried watermark.  The
streaming result must equal the batch operator on the union (with
id-ordered input), survive foreachBatch replays exactly-once, and
dedup the crash-window duplicate rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gigaspark.operators.image_pipeline import (image_corpus_filter,
                                                image_shard_pack)
from gigaspark.streaming.shard_stream import StreamingShardPacker

IMG_SCHEMA = "image_id string, w int, h int, caption string, phash long"

# image_ids ascending ACROSS batches so (batch_id, image_id) order equals
# the batch operator's global image_id order
B0 = [("a01", 128, 128, "first kept caption here", 1),
      ("a02", 16, 512, "dropped by size rule", 2),
      ("a03", 256, 128, "second kept caption here", 3)]
B1 = [("b01", 64, 64, "third kept caption text", 4),
      ("b02", 128, 128, "too short", 5),
      ("b03", 128, 128, "third kept caption text copied not verbatim", 6)]
B2 = [("c01", 512, 256, "fourth kept caption wording", 7),
      ("c02", 128, 128, "x", 8)]

SHARD = 100_000


def _batch_expected(spark):
    allrows = spark.createDataFrame(B0 + B1 + B2, IMG_SCHEMA)
    kept = image_corpus_filter(allrows).where("keep")
    nb = F.col("w").cast("long") * F.col("h").cast("long") * 3 + 64
    return {tuple(r) for r in
            image_shard_pack(kept, shard_bytes=SHARD, nbytes=nb)
            .select("image_id", "nbytes", "start_off", "shard_id",
                    "offset_in_shard").collect()}


def _got(packer):
    return {tuple(r) for r in packer.assignments()
            .select("image_id", "nbytes", "start_off", "shard_id",
                    "offset_in_shard").collect()}


def test_stream_equals_batch_pack(spark, tmp_path):
    p = StreamingShardPacker(spark, str(tmp_path / "pk"), shard_bytes=SHARD)
    for i, rows in enumerate([B0, B1, B2]):
        p.absorb_batch(spark.createDataFrame(rows, IMG_SCHEMA), i)
    want = _batch_expected(spark)
    assert _got(p) == want and len(want) >= 4
    # shard boundary actually crossed (c01 is 512*256*3 bytes)
    assert len({r[3] for r in want}) >= 2


def test_replay_is_exactly_once(spark, tmp_path):
    p = StreamingShardPacker(spark, str(tmp_path / "pk"), shard_bytes=SHARD)
    for i, rows in enumerate([B0, B1]):
        p.absorb_batch(spark.createDataFrame(rows, IMG_SCHEMA), i)
    before = _got(p)
    # at-least-once: the stream re-delivers batch 1 — committed, skipped
    p.absorb_batch(spark.createDataFrame(B1, IMG_SCHEMA), 1)
    assert _got(p) == before
    # a later batch still appends with the right watermark
    p.absorb_batch(spark.createDataFrame(B2, IMG_SCHEMA), 2)
    assert _got(p) == _batch_expected(spark)


def test_stream_caption_gate_equals_batch(spark, tmp_path):
    """Offline-trained caption LM applied in-stream: the streaming
    packer with the gate must equal the batch composition (filter ∘
    gate ∘ pack) on the union."""
    from gigaspark.operators.lmfilter import (caption_ppl_gate,
                                              train_char_bigram_lm)

    train = spark.createDataFrame(
        [(i, "first kept caption here second third fourth text "
             "wording copied not verbatim", "en") for i in range(3)],
        "doc_id long, text string, lang string")
    model, ctx = train_char_bigram_lm(train, "en")
    # gibberish caption that passes the token-count rule, fails the LM
    B3 = [("d01", 128, 128, "zzxq qqzx xqzz qzqz vjwk", 9)]

    p = StreamingShardPacker(spark, str(tmp_path / "pk"),
                             shard_bytes=SHARD, caption_model=model,
                             caption_contexts=ctx, max_mean_nll10k=30000)
    for i, rows in enumerate([B0, B1, B2, B3]):
        p.absorb_batch(spark.createDataFrame(rows, IMG_SCHEMA), i)

    allrows = spark.createDataFrame(B0 + B1 + B2 + B3, IMG_SCHEMA)
    kept = image_corpus_filter(allrows).where("keep")
    gate = caption_ppl_gate(allrows, None, _model=model, _contexts=ctx,
                            max_mean_nll10k=30000)
    kept = kept.join(gate.select("image_id", "cap_ok"), "image_id") \
               .where("cap_ok")
    nb = F.col("w").cast("long") * F.col("h").cast("long") * 3 + 64
    want = {tuple(r) for r in
            image_shard_pack(kept, shard_bytes=SHARD, nbytes=nb)
            .select("image_id", "nbytes", "start_off", "shard_id",
                    "offset_in_shard").collect()}
    assert _got(p) == want
    assert "d01" not in {t[0] for t in want}     # LM gate really fired
    assert len(want) >= 4                        # and kept the clean ones


def test_crash_window_duplicates_dedup(spark, tmp_path):
    p = StreamingShardPacker(spark, str(tmp_path / "pk"), shard_bytes=SHARD)
    p.absorb_batch(spark.createDataFrame(B0, IMG_SCHEMA), 0)
    snap = p.assignments()
    # simulate the crash between assignment append and ledger append:
    # identical rows land twice
    snap.write.mode("append").parquet(p.assign_dir)
    got = _got(p)
    assert len(got) == p.assignments().count()  # distinct() removed dups
    p.absorb_batch(spark.createDataFrame(B1, IMG_SCHEMA), 1)
    p.absorb_batch(spark.createDataFrame(B2, IMG_SCHEMA), 2)
    assert _got(p) == _batch_expected(spark)


def test_through_writestream(spark, tmp_path):
    """The real Structured Streaming path: file source → foreachBatch."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    p = StreamingShardPacker(spark, str(tmp_path / "pk"), shard_bytes=SHARD)
    for rows in [B0, B1, B2]:
        spark.createDataFrame(rows, IMG_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = spark.readStream.schema(IMG_SCHEMA).parquet(src)
    q = (stream.writeStream.foreachBatch(p.sink())
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # file order within one availableNow batch isn't pinned across
    # batches here only if maxFilesPerTrigger splits them; the default
    # single batch still satisfies the operator's (batch, id) order
    got_ids = {r[0] for r in _got(p)}
    want_ids = {r[0] for r in _batch_expected(spark)}
    assert got_ids == want_ids
    # offsets are a permutation of the same byte stream: total length
    # and per-sample nbytes match the batch plan
    tot = (p.assignments().agg(F.sum("nbytes")).collect()[0][0])
    assert tot == sum(r[1] for r in _batch_expected(spark))
