"""fastText-style hashed bag-of-n-grams quality classifier
(Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification", public) — the linear classifier every large-scale
LLM-data pipeline runs for quality/domain selection (CCNet, LLaMA's
Wikipedia-reference filter; public papers).

Reference parity note: Gigablast has no learned text classifier; this
is driver-mandated training-data-pipeline surface (SURVEY §2-LLM),
spec'd from the public paper, not from ``/root/reference`` (empty
checkout, citations stay [U] per SURVEY §0).

Model shape: word unigrams + adjacent-word bigrams, hashed into
``n_buckets`` (the paper's hashing trick), count-valued; a single
linear layer trained by full-batch gradient descent on a logistic-
style loss.  Everything is pinned to INTEGER arithmetic so the DuckDB
oracle reproduces training AND scoring bit-for-bit:

  * weights live at probability scale ``S = 1e6``, start at 0;
  * margin ``m = Σ_b w_b · x_b`` (x = feature count, exact int);
  * probability is the HARD sigmoid (Courbariaux et al. 2016, public):
    ``p = clamp(S/2 + m DIV 4, 0, S)`` — piecewise-linear, so both
    engines agree exactly (true sigmoid would put a transcendental
    float in the training loop);
  * error ``e = p − y·S``; gradient ``g_b = Σ_docs e·x_b``;
  * update ``w' = w − g DIV (eta_den · n_train)`` — the 1/n batch
    mean and learning rate 1/eta_den folded into one floor division.
    NOTE both engines' integer division TRUNCATES TOWARD ZERO on
    negatives (verified: Spark ``DIV`` and DuckDB ``//`` give
    −7/2 = −3) — a pure-python mirror must use ``int(a/b)``, not
    ``//`` (which floors).

Scale shape (100 TB story): features are ONE explode + ONE uniform
(doc_id, bucket) count agg — map-side combinable, no skew (md5
buckets).  Each GD round is two broadcast-sized joins: the model is at
most ``n_buckets`` rows (2^12 by default — KBs), so margins come from
a broadcast join against the cached training features and the
gradient is one more uniform bucket agg.  The corpus is never joined
to itself; scoring the full corpus is the same broadcast join once.
Training-set size enters as a broadcast 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gigaspark.session import bounded_collect

SCALE = 1_000_000
N_BUCKETS = 4096
ETA_DEN = 64


def _norm(c) -> F.Column:
    """ASCII-pinned normalisation (same law as the CCNet LM filter)."""
    x = F.regexp_replace(c, "[^A-Za-z0-9 ]+", " ")
    x = F.lower(x)
    x = F.regexp_replace(x, " {2,}", " ")
    return F.trim(x)


def hashed_features(docs: DataFrame, text_col: str = "text",
                    n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, bucket, x) — hashed unigram+bigram counts per doc."""
    ws = F.filter(F.split(_norm(F.col(text_col)), " "), lambda w: w != "")
    # parallelize the per-row tokenize/md5/explode work: a small corpus
    # arrives as ONE file split and would otherwise run this whole
    # stage single-task (measured 8 s → 0.5 s at sf0.1).  Only the slim
    # (doc_id, text) projection shuffles, and only when the scan has
    # fewer splits than the session's parallelism — a 100 TB corpus
    # already has thousands of splits and skips this branch.
    slim = docs.select("doc_id", F.col(text_col))
    par = docs.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    base = slim.select("doc_id", ws.alias("ws"))
    bigrams = F.when(
        F.size("ws") >= 2,
        F.expr("transform(sequence(1, size(ws) - 1),"
               " i -> concat(ws[i-1], '_', ws[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        "doc_id", F.explode(F.concat(F.col("ws"), bigrams)).alias("feat"))
    bucket = (F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10)
              .cast("long") % n_buckets)
    return (feats.select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("x")))


def _hard_sigmoid(m, scale: int = SCALE):
    return F.least(F.lit(scale).cast("long"),
                   F.greatest(F.lit(0).cast("long"),
                              F.lit(scale // 2) + F.expr(f"({m}) DIV 4")))


def train_quality_logreg(feats: DataFrame, labels: DataFrame,
                         n_iter: int = 2, eta_den: int = ETA_DEN,
                         scale: int = SCALE) -> DataFrame:
    """(bucket, w) after ``n_iter`` pinned full-batch GD rounds.

    ``labels``: (doc_id, y) with y in {0,1}, restricted to the
    TRAINING docs (the caller picks the split — a deterministic hash
    split keeps the oracle exact).
    """
    from gigaspark.session import stable_checkpoint

    spark = feats.sparkSession
    # the model is BOUNDED (<= n_buckets = 4096 rows) — it lives on the
    # driver between rounds, the same bounded-scalar discipline as the
    # BPE vocab merge loop: one collect job per GD round instead of an
    # eager checkpoint + broadcast-exchange build + ntr broadcast join
    # (measured 2.9 s/round → ~1 s/round at sf0.1, identical arithmetic
    # — the DIV update still runs Spark-side, so truncation semantics
    # are the engine's, not Python's)
    n_train = labels.count()
    # the labeled TRAINING set is bounded by design (a quality
    # classifier trains on a sample, not the corpus — fastText paper
    # uses ~10^5-10^6 docs), so pin it to a few doc_id-hashed
    # partitions: the GD rounds then run 8-task stages instead of
    # shuffle_partitions-width ones (at 64 partitions the per-round
    # wall was pure task-scheduling latency), while the doc_id hash
    # partitioning keeps the margin/gradient chain shuffle-free
    tf = stable_checkpoint(
        feats.join(labels, "doc_id")
        .repartition(8, "doc_id"))  # (doc_id,bucket,x,y)
    w_rows = sorted((r["bucket"], 0) for r in
                    bounded_collect(feats.select("bucket").distinct(),
                                    2 * N_BUCKETS, "model buckets"))
    for _ in range(n_iter):
        w = spark.createDataFrame(w_rows, "bucket long, w long")
        # margin agg keyed by doc_id ALONE (y is constant per doc and
        # rides along via first()): tf is checkpointed partitioned by
        # doc_id, so the margin agg, the error projection and the
        # gradient join below all stay in ONE shuffle-free stage — the
        # only exchange per GD round is the final by-bucket gradient agg
        m = (tf.join(F.broadcast(w), "bucket")
             .groupBy("doc_id")
             .agg(F.sum(F.expr("x * w")).alias("m"),
                  F.first("y").alias("y")))
        err = m.select(
            "doc_id",
            (_hard_sigmoid("m", scale) - F.col("y") * scale).alias("err"))
        g = (tf.join(err, "doc_id")
             .groupBy("bucket").agg(F.sum(F.expr("err * x")).alias("g")))
        upd = (w.join(g, "bucket", "left")
               .select("bucket", F.expr(
                   f"w - coalesce(g, CAST(0 AS BIGINT))"
                   f" DIV ({eta_den} * {n_train})").alias("w")))
        w_rows = sorted((r["bucket"], r["w"]) for r in bounded_collect(
            upd, 2 * N_BUCKETS, "model weight update"))
    return spark.createDataFrame(w_rows, "bucket long, w long")


def classify(docs: DataFrame, feats: DataFrame, weights: DataFrame,
             scale: int = SCALE) -> DataFrame:
    """(doc_id, margin, p_fp, keep) for EVERY doc (feature-less docs
    score margin 0).  keep is pinned to margin > 0."""
    m = (feats.join(F.broadcast(weights), "bucket")
         .groupBy("doc_id").agg(F.sum(F.expr("x * w")).alias("m")))
    return (docs.select("doc_id").join(m, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("m", F.lit(0).cast("long")).alias("margin"))
            .select("doc_id", "margin",
                    _hard_sigmoid("margin", scale).alias("p_fp"),
                    (F.col("margin") > 0).alias("keep")))
