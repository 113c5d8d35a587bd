"""image_corpus_filter + image_shard_pack (image-payload pipeline).

Covers: pinned reason precedence, planted-duplicate detection, the
bytes-column-never-read promise (ReadSchema audit), shard-window
assignment invariants, and parallelism invariance of the prefix-sum
packing (the two-level cumsum must be bit-identical at any partitioning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gigaspark.operators.image_pipeline import (image_corpus_filter,
                                                image_shard_pack)


def _imgs(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, caption string, phash long")


def test_reason_precedence_pinned(spark):
    rows = [
        # too small AND bad aspect AND bad caption -> 'size' wins
        ("a", 16, 512, "x", 1),
        # aspect 4.1 > 4.0 -> 'aspect'
        ("b", 512, 123, "three token caption", 2),
        # caption too short (2 < 3) -> 'caption'
        ("c", 128, 128, "two tokens", 3),
        # duplicate of e (same phash, higher id) -> 'duplicate'
        ("e", 128, 128, "a good caption here", 4),
        ("f", 128, 128, "another good caption", 4),
        # clean keep
        ("g", 256, 128, "perfectly fine caption text", 5),
    ]
    out = {r["image_id"]: r for r in
           image_corpus_filter(_imgs(spark, rows)).collect()}
    assert out["a"]["reason"] == "size" and not out["a"]["keep"]
    assert out["b"]["reason"] == "aspect"
    assert out["c"]["reason"] == "caption"
    assert out["e"]["reason"] == "keep"      # canonical winner (min id)
    assert out["f"]["reason"] == "duplicate" and out["f"]["duplicate"]
    assert out["g"]["reason"] == "keep" and out["g"]["keep"]


def test_filter_ppl_composed_precedence(spark):
    """caption_ppl slots between 'caption' and 'duplicate': an image
    whose caption passes the token-count rule but fails the LM gate
    drops with reason 'caption_ppl'; clean captions keep."""
    from gigaspark.operators.image_pipeline import image_corpus_filter_ppl

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog "
             "a scan of the table returns sorted rows", "en")
         for i in range(4)],
        "doc_id long, text string, lang string")
    rows = [
        ("a", 128, 128, "the quick brown fox jumps", 1),   # keep
        ("b", 128, 128, "zzxq qqzx xqzz qzqz vjwk", 2),    # gibberish
        ("c", 16, 128, "zzxq qqzx xqzz qzqz vjwk", 3),     # size wins
        ("d", 128, 128, "zzxq qqzx xqzz qzqz vjwk", 2),    # dup phash,
    ]                                  # but caption_ppl outranks duplicate
    out = {r["image_id"]: r for r in
           image_corpus_filter_ppl(_imgs(spark, rows), train,
                                   max_mean_nll10k=30000).collect()}
    assert out["a"]["reason"] == "keep" and out["a"]["cap_ok"]
    assert out["b"]["reason"] == "caption_ppl" and not out["b"]["cap_ok"]
    assert out["c"]["reason"] == "size"
    assert out["d"]["reason"] == "caption_ppl"


def test_caption_token_rule(spark):
    rows = [("a", 128, 128, "", 1),
            ("b", 128, 128, "   ", 2),
            ("c", 128, 128, "one  two\tthree", 3)]
    out = {r["image_id"]: r for r in
           image_corpus_filter(_imgs(spark, rows)).collect()}
    assert out["a"]["cap_tokens"] == 0 and out["a"]["reason"] == "caption"
    assert out["b"]["cap_tokens"] == 0
    assert out["c"]["cap_tokens"] == 3 and out["c"]["reason"] == "keep"


def test_filter_never_reads_bytes(spark):
    """The decision is metadata-only: the optimized plan's parquet scan
    must not include the (100 TB) bytes column."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "imgs")
        _imgs(spark, [("a", 128, 128, "a decent caption text", 7)]) \
            .withColumn("bytes", F.lit(b"\x00" * 64)) \
            .write.parquet(p)
        df = image_corpus_filter(spark.read.parquet(p))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bytes" not in plan, plan


def test_shard_pack_windows(spark):
    rows = [(f"i{k:02d}", 1, 1, "c", k) for k in range(10)]
    imgs = _imgs(spark, rows).withColumn("bytes", F.lit(b"x" * 100))
    out = image_shard_pack(imgs, shard_bytes=250).orderBy("image_id") \
        .collect()
    # stream offsets 0,100,...,900; windows of 250 bytes
    assert [r["start_off"] for r in out] == [100 * k for k in range(10)]
    assert [r["shard_id"] for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert [r["offset_in_shard"] for r in out] == \
        [0, 100, 200, 50, 150, 0, 100, 200, 50, 150]


def test_shard_pack_oversized_sample(spark):
    """A sample larger than the budget owns several windows' span; the
    next sample lands in the window containing ITS start (pinned rule)."""
    imgs = spark.createDataFrame(
        [("a", b"x" * 900), ("b", b"y" * 100)],
        "image_id string, bytes binary")
    out = {r["image_id"]: r for r in
           image_shard_pack(imgs, shard_bytes=250).collect()}
    assert out["a"]["shard_id"] == 0
    assert out["b"]["shard_id"] == 3 and out["b"]["offset_in_shard"] == 150


def test_shard_pack_parallelism_invariant(spark):
    rows = [(f"i{k:04d}", 1, 1, "c", k) for k in range(500)]
    imgs = _imgs(spark, rows).withColumn(
        "bytes", F.repeat(F.lit("x"), (F.col("phash") % 97 + 1).cast("int"))
        .cast("binary"))
    a = image_shard_pack(imgs, shard_bytes=1000).collect()
    b = image_shard_pack(imgs.repartition(13), shard_bytes=1000,
                         small_count=None).collect()
    c = image_shard_pack(imgs.coalesce(1), shard_bytes=1000).collect()
    key = lambda r: r["image_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key) == sorted(c, key=key)


def test_filter_feeds_pack_composition(spark):
    """Kept set -> shard pack end to end with a metadata nbytes expr."""
    rows = [("a", 16, 16, "tiny dropped", 1),
            ("b", 128, 128, "kept caption number one", 2),
            ("c", 128, 128, "kept caption number two", 3)]
    kept = image_corpus_filter(_imgs(spark, rows)).where("keep")
    nb = F.col("w").cast("long") * F.col("h") * 3 + 64
    out = image_shard_pack(kept, shard_bytes=1 << 18, nbytes=nb) \
        .orderBy("image_id").collect()
    assert [r["image_id"] for r in out] == ["b", "c"]
    assert out[0]["nbytes"] == 128 * 128 * 3 + 64
    assert out[1]["start_off"] == out[0]["nbytes"]


def test_synth_images_table_roundtrip(spark, tmp_path):
    """The operators run over the REAL synthesized images table (binary
    blobs present) — filter decisions and pack offsets are consistent."""
    from gigaspark.synth import SynthParams, gen_images

    gen_images(str(tmp_path), SynthParams(n_images=60))
    imgs = spark.read.parquet(str(tmp_path / "images.parquet"))
    dec = image_corpus_filter(imgs, min_dim=32, max_aspect_x10=40,
                              min_cap_tokens=3, max_cap_tokens=12)
    assert dec.count() == 60
    # synth dims are 32..128 so nothing is too_small/bad_aspect
    assert dec.where("too_small or bad_aspect").count() == 0
    packed = image_shard_pack(imgs, shard_bytes=1 << 16)
    rows = packed.orderBy("start_off").collect()
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_off"] == prev["start_off"] + prev["nbytes"]


def test_caption_align_classes(spark):
    """Identical vectors score 10000; a vector vs its reverse scores low;
    a half-match lands near 5000 — the pinned 2800 gate separates them."""
    import numpy as np

    from gigaspark.operators.image_pipeline import image_caption_align

    rng = np.random.RandomState(7)
    v = rng.randn(64).astype("float32").tolist()
    rows = [
        ("same", v, v),
        ("rev", v, v[::-1]),
        ("half", v, v[:32] + v[::-1][32:]),
    ]
    out = {r["image_id"]: r for r in image_caption_align(
        spark.createDataFrame(
            rows, "image_id string, img_vec array<float>, "
                  "cap_vec array<float>")).collect()}
    assert out["same"]["align_x10k"] == 10000 and out["same"]["aligned"]
    assert abs(out["rev"]["align_x10k"]) < 2800 and not out["rev"]["aligned"]
    assert 3000 < out["half"]["align_x10k"] < 7000 and out["half"]["aligned"]


def test_caption_align_no_shuffle(spark):
    """The alignment gate is a pure per-row map: the physical plan must
    contain no Exchange and no python UDF — it rides the scan."""
    from gigaspark.operators.image_pipeline import image_caption_align

    pairs = spark.createDataFrame(
        [("a", [1.0] * 4, [1.0] * 4)],
        "image_id string, img_vec array<float>, cap_vec array<float>")
    plan = image_caption_align(pairs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_aspect_batches_rule_and_fill(spark):
    """Pinned bucket boundaries; batches fill to batch_size in image_id
    order within each bucket; only the last batch per bucket is short."""
    from collections import Counter

    from gigaspark.operators.image_pipeline import image_aspect_batches

    rows = ([(f"sq{k:02d}", 100, 100, "c", k) for k in range(7)]
            + [(f"wd{k:02d}", 512, 16, "c", k) for k in range(5)]
            + [("tl00", 16, 512, "c", 99)])
    out = image_aspect_batches(_imgs(spark, rows), batch_size=3).collect()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["sq00"]["bucket"] == "square"     # a10 = 10
    assert by_id["wd00"]["bucket"] == "wide"       # a10 = 320
    assert by_id["tl00"]["bucket"] == "tall"       # a10 = 0
    # within-bucket contiguous 0-based index in image_id order
    sq = sorted((r for r in out if r["bucket"] == "square"),
                key=lambda r: r["image_id"])
    assert [r["idx_in_bucket"] for r in sq] == list(range(7))
    assert [r["batch_no"] for r in sq] == [0, 0, 0, 1, 1, 1, 2]
    # every non-final batch is exactly full
    sizes = Counter((r["bucket"], r["batch_no"]) for r in out)
    for bucket in {r["bucket"] for r in out}:
        batches = sorted(b for (bk, b) in sizes if bk == bucket)
        for b in batches[:-1]:
            assert sizes[(bucket, b)] == 3


def test_aspect_batches_parallelism_invariant(spark):
    from gigaspark.operators.image_pipeline import image_aspect_batches

    rows = [(f"i{k:04d}", 16 * (1 + k % 5), 16 * (1 + (k * 7) % 5),
             "c", k) for k in range(400)]
    imgs = _imgs(spark, rows)
    key = lambda r: r["image_id"]  # noqa: E731
    a = sorted(image_aspect_batches(imgs, 16).collect(), key=key)
    b = sorted(image_aspect_batches(imgs.repartition(13), 16).collect(),
               key=key)
    c = sorted(image_aspect_batches(imgs.coalesce(1), 16).collect(), key=key)
    assert a == b == c
