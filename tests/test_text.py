"""Unit tests for text-analysis functions (tokens, quality, langid,
fingerprints, shingles) and the multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gigaspark.functions.text import (
    bpe_ish_token_count, content_fingerprint, langid, punct_ratio,
    quality_score, shingles, stopword_ratio, token_count,
)

ROWS = [
    (0, "The quick brown fox and the lazy dog ran to the old mill for food."),
    (1, "der hund und die katze sind nicht der gleiche und nicht gleich"),
    (2, "le chat et le chien et les oiseaux"),
    (3, ""),
    (4, "x"),
    (5, "a b  c   d\te\nf"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _one(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_token_count(docs):
    got = _one(docs.select("doc_id", token_count(F.col("text")).alias("n")), "n")
    assert got[3] == 0
    assert got[4] == 1
    assert got[5] == 6          # mixed whitespace collapses
    assert got[0] == 15


def test_bpe_tokens_ge_words(docs):
    d = docs.select("doc_id", token_count(F.col("text")).alias("w"),
                    bpe_ish_token_count(F.col("text")).alias("b")).collect()
    for r in d:
        assert r["b"] >= r["w"]


def test_ratios_and_quality(docs):
    df = docs.select(
        "doc_id",
        stopword_ratio(F.col("text")).alias("sr"),
        punct_ratio(F.col("text")).alias("pr"),
        quality_score(F.col("text")).alias("q"))
    for r in df.collect():
        assert 0.0 <= r["pr"] <= 1.0
        assert 0.0 <= r["q"] <= 1.0
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[0]["sr"] > 0.2          # English text has stopwords
    assert got[0]["q"] >= 0.75         # long clean English → high quality
    assert got[3]["q"] <= 0.5          # empty → low


def test_langid(docs):
    got = _one(docs.select("doc_id", langid(F.col("text")).alias("l")), "l")
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "hello worlds")],
        "doc_id long, text string")
    got = _one(df.select("doc_id", content_fingerprint(F.col("text")).alias("f")), "f")
    assert got[0] == got[1] != got[2]


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b"), (2, "")],
                               "doc_id long, text string")
    got = _one(df.select("doc_id", shingles(F.col("text"), 3).alias("s")), "s")
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []
    assert got[2] == []


def test_multimodal_features_roundtrip(spark):
    import numpy as np

    from gigaspark.functions.images import FORMATS, encode_image
    from gigaspark.operators.multimodal import extract_features, resize_nn

    rows = []
    for i, fmt in enumerate(FORMATS):
        rng = np.random.default_rng(i)
        pix = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
        rows.append((f"im{i}", bytearray(encode_image(fmt, pix)), fmt))
    rows.append(("bad", bytearray(b"notanimage"), "ppm"))
    rows.append(("jpegstub", bytearray(b"\xff\xd8\xff"), "jpg"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")

    feats = {r["image_id"]: r for r in extract_features(df).collect()}
    for i, fmt in enumerate(FORMATS):
        r = feats[f"im{i}"]
        assert r["decode_ok"] and r["w"] == 12 and r["h"] == 8
        assert 0 <= r["mean_r"] <= 255 and r["entropy_bits"] > 0
    assert feats["bad"]["decode_ok"] is False
    assert feats["jpegstub"]["decode_ok"] is False  # truncated jpg → clean miss

    thumbs = resize_nn(df, 4, 4).collect()
    ok = {r["image_id"]: r for r in thumbs}
    assert set(ok) == {f"im{i}" for i in range(len(FORMATS))}
    for r in thumbs:
        assert r["w"] == 4 and r["h"] == 4


def test_pii_counts_and_redaction(spark):
    from gigaspark.functions.text import pii_counts, redact_pii
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b%c@ex-ample.co.uk and root@h.io, ip 10.0.0.1, "
             "call 555-123-4567 or 555.123.4567"),
         (2, "nothing sensitive: 1.2 v3.4.5 999-99-9999 12345"),
         (3, "edge 192.168.001.001 and 555 123 4567")],
        "doc_id long, text string")
    ne, ni, np_ = pii_counts(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", ne.alias("e"), ni.alias("i"), np_.alias("p"),
        redact_pii(F.col("text")).alias("r")).collect()}
    assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (2, 1, 2)
    assert "<EMAIL>" in got[1]["r"] and "<IPV4>" in got[1]["r"] \
        and "<PHONE>" in got[1]["r"]
    assert "@" not in got[1]["r"] and "555" not in got[1]["r"]
    assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 0, 0)
    assert got[2]["r"] == "nothing sensitive: 1.2 v3.4.5 999-99-9999 12345"
    # space-separated phone and zero-padded quad both count
    assert (got[3]["e"], got[3]["i"], got[3]["p"]) == (0, 1, 1)
