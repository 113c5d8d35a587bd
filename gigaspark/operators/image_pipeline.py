"""Image-corpus curation pipeline (the image-payload counterpart of
:mod:`gigaspark.operators.pipeline` — beyond-reference training-pipeline
mandate; the north-rule input shape is the image+caption table).

Operators a 100 TB image+caption corpus run actually needs:

``image_corpus_filter`` — the LAION-style keep/drop decision as ONE
declarative plan over the (image_id, w, h, caption, phash) metadata:

  * size / aspect / caption-length rules are pure Column expressions —
    they ride the first parquet scan inside whole-stage codegen, with
    ``w``/``h``/``caption`` pushed down so ``bytes`` (the 100 TB column)
    is NEVER read;
  * exact-phash dedup groups on ``phash`` (a 64-bit perceptual hash —
    uniform key, no skew) and keeps the min image_id per group
    (canonical-winner rule, same shape as the text corpus filter).

  Rule precedence is PINNED (first failing rule names the reason):
  ``size`` -> ``aspect`` -> ``caption`` -> ``duplicate`` -> ``keep``.
  All thresholds are integers (aspect is compared at x10 fixed point)
  so a SQL oracle reproduces the decision bit-for-bit.

``image_shard_pack`` — webdataset-style shard assignment: lay the kept
samples on a byte stream in image_id total order and assign each sample
to the shard whose aligned byte window ``[s*B, (s+1)*B)`` contains its
start offset.  PINNED deviation from a sequential close-after-exceed
writer: windows are aligned multiples of the budget (drift-free), so the
assignment is a pure function of the exclusive prefix sum — a sample
larger than the budget occupies several windows' span but belongs to
the window containing its start.  The only global state is that prefix
sum, computed with the two-level range-sort + broadcast-offsets pattern
(:func:`gigaspark.operators.ordering.with_global_cumsum`) — no
single-task window, one range shuffle, O(P) driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from gigaspark.operators.ordering import with_global_cumsum, with_global_seq


def caption_tokens(c: Column) -> Column:
    """Token count of a single-space-normalized caption (pinned rule:
    split on runs of whitespace after trim; '' counts 0).  DuckDB
    mirror: ``len(string_split_regex(trim(caption), '\\s+'))`` guarded
    by the empty case."""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)) \
        .otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def image_corpus_filter(imgs: DataFrame, min_dim: int = 32,
                        max_aspect_x10: int = 40,
                        min_cap_tokens: int = 3,
                        max_cap_tokens: int = 12) -> DataFrame:
    """(image_id, w, h, cap_tokens, too_small, bad_aspect, bad_caption,
    duplicate, keep, reason) — the full decision per image.

    Only metadata columns are touched: the plan's ReadSchema must not
    include ``bytes`` (asserted in tests/test_image_pipeline.py).
    """
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    base = imgs.select(
        "image_id", "w", "h", "phash",
        caption_tokens(F.col("caption")).alias("cap_tokens"),
        (F.least(w, h) < min_dim).alias("too_small"),
        (F.greatest(w, h) * 10 > F.least(w, h) * max_aspect_x10)
        .alias("bad_aspect"))
    base = base.withColumn(
        "bad_caption",
        (F.col("cap_tokens") < min_cap_tokens)
        | (F.col("cap_tokens") > max_cap_tokens))

    # canonical-winner exact-phash dedup: min image_id per phash group.
    # A whole-partition window-min (no ORDER BY -> no sort, just one
    # exchange on the uniform phash key) beats groupBy+join-back, which
    # would re-scan the (100 TB) source for the agg branch.
    wmin = Window.partitionBy("phash")
    j = base.withColumn(
        "duplicate", F.col("image_id") != F.min("image_id").over(wmin))

    reason = (
        F.when(F.col("too_small"), F.lit("size"))
        .when(F.col("bad_aspect"), F.lit("aspect"))
        .when(F.col("bad_caption"), F.lit("caption"))
        .when(F.col("duplicate"), F.lit("duplicate"))
        .otherwise(F.lit("keep")))
    return (j.withColumn("reason", reason)
            .withColumn("keep", F.col("reason") == "keep")
            .select("image_id", "w", "h", "cap_tokens", "too_small",
                    "bad_aspect", "bad_caption", "duplicate", "keep",
                    "reason"))


def image_corpus_filter_ppl(imgs: DataFrame, train_docs: DataFrame,
                            max_mean_nll10k: int = 17500,
                            **filter_kw) -> DataFrame:
    """:func:`image_corpus_filter` extended with the CCNet caption-
    perplexity gate (`gigaspark.operators.lmfilter.caption_ppl_gate`) —
    the LAION/DataComp text-quality rule composed into the one-plan
    keep/drop decision.  Pinned precedence gains one rung:
    ``size → aspect → caption → caption_ppl → duplicate → keep``.

    The gate joins on ``image_id`` (uniform key); the LM model inside
    it is broadcast, so the composition adds exactly one corpus-side
    shuffle (the caption scoring agg) to the base filter's plan.
    """
    from gigaspark.operators.lmfilter import caption_ppl_gate

    dec = image_corpus_filter(imgs, **filter_kw)
    gate = caption_ppl_gate(imgs, train_docs,
                            max_mean_nll10k=max_mean_nll10k) \
        .select("image_id", "cap_ok")
    reason = (
        F.when(F.col("too_small"), F.lit("size"))
        .when(F.col("bad_aspect"), F.lit("aspect"))
        .when(F.col("bad_caption"), F.lit("caption"))
        .when(~F.col("cap_ok"), F.lit("caption_ppl"))
        .when(F.col("duplicate"), F.lit("duplicate"))
        .otherwise(F.lit("keep")))
    return (dec.drop("keep", "reason").join(gate, "image_id")
            .withColumn("reason", reason)
            .withColumn("keep", F.col("reason") == "keep")
            .select("image_id", "w", "h", "cap_tokens", "too_small",
                    "bad_aspect", "bad_caption", "cap_ok", "duplicate",
                    "keep", "reason"))


def image_shard_pack(imgs: DataFrame, shard_bytes: int = 1 << 18,
                     nbytes: Column | None = None,
                     small_count: int | None = None) -> DataFrame:
    """Shard assignment over the image_id-ordered byte stream.

    ``nbytes`` defaults to ``length(bytes)``; pass an expression when
    the payload column is elsewhere (e.g. a pinned ``w*h*3 + header``
    estimate so the scan never reads the blobs).  Output: (image_id,
    nbytes, start_off, shard_id, offset_in_shard), all bigint.
    """
    nb = (F.length("bytes") if nbytes is None else nbytes).cast("long")
    t = imgs.select("image_id", nb.alias("nbytes")) \
        .where(F.col("nbytes") > 0)
    c = with_global_cumsum(t, [F.col("image_id").asc()], "nbytes",
                           "start_off", small_count)
    shard = F.floor(F.col("start_off") / shard_bytes).cast("long")
    return c.select(
        "image_id", "nbytes", "start_off", shard.alias("shard_id"),
        (F.col("start_off") - shard * shard_bytes).alias("offset_in_shard"))


def image_caption_align(pairs: DataFrame,
                        threshold_x10k: int = 2800) -> DataFrame:
    """CLIP-score-style image↔caption alignment gate (the LAION recipe's
    central filter: drop pairs whose image embedding and caption
    embedding disagree — the pinned stand-in for ``clip_sim >= 0.28``).

    Input: (image_id, img_vec: array<float>, cap_vec: array<float>).
    Output: (image_id, align_x10k: bigint, aligned: boolean).

    ``align_x10k = floor(cosine(q(img), q(cap)) * 10000 + 0.5)`` where
    ``q`` is the repo's pinned embedding quantizer
    (:func:`gigaspark.operators.similarity.quantize` — integer lattice,
    so the dot/norm products are exact and the single final rounding is
    bit-identical cross-engine).  ``aligned = align_x10k >=
    threshold_x10k`` compares integers — no float threshold ambiguity.

    Scale shape: a pure per-row map — the score rides the parquet scan
    inside one projection, NO shuffle, NO UDF (``zip_with``/``aggregate``
    are JVM higher-order functions).  At 100 TB this is the cheapest
    possible plan: embarrassingly parallel, bytes column untouched.
    """
    from gigaspark.operators.similarity import int_dot, quantize

    iv, cv = quantize(F.col("img_vec")), quantize(F.col("cap_vec"))
    align = F.floor(
        int_dot(iv, cv)
        / F.sqrt(int_dot(iv, iv).cast("double")
                 * int_dot(cv, cv).cast("double"))
        * 10000 + 0.5).cast("long")
    return pairs.select(
        "image_id", align.alias("align_x10k"),
        (align >= threshold_x10k).alias("aligned"))


def image_aspect_batches(imgs: DataFrame, batch_size: int = 64,
                         small_count: int | None = None) -> DataFrame:
    """Aspect-ratio bucket batching — group images of similar aspect
    into fixed-size training batches so a resize-to-bucket-shape
    dataloader never mixes portrait and panorama in one batch (the
    SDXL/NaViT-style bucketing step every image trainer runs).

    Bucket rule is PINNED integer math: ``aspect_x10 = (w*10) div h``,
    bucket = tall(≤5) / portrait(≤8) / square(≤12) / landscape(≤20) /
    wide(>20).  Within a bucket, images take their ``image_id`` total
    order; ``batch_no = idx_in_bucket div batch_size``.

    Scale shape: buckets are FEW (5) and huge, so
    ``row_number() OVER (PARTITION BY bucket)`` would put a fifth of the
    corpus in one task.  Instead the global two-level sequence
    (:func:`gigaspark.operators.ordering.with_global_seq`) runs over the
    total order ``(bucket, image_id)`` — bucket-contiguous by
    construction — and a broadcast 5-row min-seq-per-bucket join rebases
    each bucket to 0.  One range shuffle + one tiny agg, parallelism-
    invariant output.

    Output: (image_id, bucket, aspect_x10, idx_in_bucket, batch_no,
    batch_id) — batch_id = '<bucket>/<batch_no>'.
    """
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    a10 = F.expr("(w * 10) div h").cast("long")
    bucket = (
        F.when(a10 <= 5, F.lit("tall"))
        .when(a10 <= 8, F.lit("portrait"))
        .when(a10 <= 12, F.lit("square"))
        .when(a10 <= 20, F.lit("landscape"))
        .otherwise(F.lit("wide")))
    t = imgs.select("image_id", w.alias("w"), h.alias("h")) \
        .withColumn("aspect_x10", a10) \
        .withColumn("bucket", bucket) \
        .select("image_id", "bucket", "aspect_x10")
    s = with_global_seq(t, [F.col("bucket").asc(), F.col("image_id").asc()],
                        "_seq", small_count)
    base = s.groupBy("bucket").agg(F.min("_seq").alias("_b0"))
    idx = (F.col("_seq") - F.col("_b0")).cast("long")
    bno = F.floor(idx / batch_size).cast("long")
    return (s.join(F.broadcast(base), "bucket")
            .select("image_id", "bucket", "aspect_x10",
                    idx.alias("idx_in_bucket"), bno.alias("batch_no"),
                    F.concat_ws("/", F.col("bucket"),
                                bno.cast("string")).alias("batch_id")))
