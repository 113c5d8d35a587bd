"""fastText-style hashed logistic classifier: learning + pinned math."""

from __future__ import annotations

from pyspark.sql import functions as F

from gigaspark.operators.classifier import (SCALE, classify, hashed_features,
                                            train_quality_logreg)


def _corpus(spark, n=40):
    """Two separable classes: clean encyclopedia-ish vs spam-ish text."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"reliable encyclopedia article section {i % 5} "
                            "with careful citations and history"))
        else:
            rows.append((i, f"cheap casino bonus click now winner {i % 5} "
                            "free free prize"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learns_planted_classes(spark):
    """After 3 GD rounds on half the docs, the classifier separates the
    held-out half perfectly (margin sign = class)."""
    docs = _corpus(spark)
    feats = hashed_features(docs)
    train = docs.filter(F.col("doc_id") < 20).select(
        "doc_id", (F.col("doc_id") % 2 == 0).cast("int").alias("y"))
    w = train_quality_logreg(feats, train, n_iter=3)
    scored = {r["doc_id"]: r for r in classify(docs, feats, w).collect()}
    for i in range(20, 40):  # held-out
        assert scored[i]["keep"] == (i % 2 == 0), i
        if i % 2 == 0:
            assert scored[i]["margin"] > 0
        else:
            assert scored[i]["margin"] < 0
    # hard-sigmoid output stays clamped to [0, SCALE]
    assert all(0 <= r["p_fp"] <= SCALE for r in scored.values())


def test_featureless_doc_scores_neutral(spark):
    """A doc whose text normalises to empty gets margin 0 / p = S/2 and
    is NOT kept (keep pinned to margin > 0)."""
    docs = spark.createDataFrame(
        [(1, "real words here"), (2, "!!! ??? ...")],
        "doc_id long, text string")
    feats = hashed_features(docs)
    labels = docs.select("doc_id", F.lit(1).alias("y"))
    w = train_quality_logreg(feats, labels, n_iter=1)
    got = {r["doc_id"]: r for r in classify(docs, feats, w).collect()}
    assert got[2]["margin"] == 0
    assert got[2]["p_fp"] == SCALE // 2
    assert got[2]["keep"] is False


def test_bigram_features_distinguish_order(spark):
    """'a b' and 'b a' share unigrams but differ in the bigram bucket —
    hashed_features must emit distinct buckets for them."""
    docs = spark.createDataFrame([(1, "alpha beta"), (2, "beta alpha")],
                                 "doc_id long, text string")
    f = hashed_features(docs)
    b1 = {r["bucket"] for r in f.filter("doc_id = 1").collect()}
    b2 = {r["bucket"] for r in f.filter("doc_id = 2").collect()}
    assert b1 != b2
    # 2 unigrams + 1 bigram each
    assert f.groupBy("doc_id").count().collect()[0]["count"] == 3
