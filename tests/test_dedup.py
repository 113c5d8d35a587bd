"""Unit tests for corpus dedup operators (exact / minhash-LSH / simhash /
n-gram Jaccard) — cross-engine parity is covered by the driver oracle;
these pin the semantic properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gigaspark.operators.dedup import (
    doc_shingles, exact_dups, lsh_candidate_pairs, minhash_signatures,
    ngram_jaccard_pairs, perm_coeffs, simhash,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "THE  Quick  Brown Fox jumps over the lazy dog near the river bank"),  # norm dup of 0
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup
    (4, "completely different content about spark query engines and shuffles"),
    (5, "another unrelated document mentioning bloom filters and politeness"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dups(docs):
    rows = {r["keep_doc_id"]: r["n_dups"] for r in exact_dups(docs).collect()}
    assert rows[0] == 3  # docs 0,1,2 collapse after normalization
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1


def test_perm_coeffs_deterministic():
    assert perm_coeffs(4) == perm_coeffs(4)
    assert len({c for c in perm_coeffs(16)}) == 16


def test_minhash_identical_docs_identical_sigs(docs):
    sh = doc_shingles(docs, k=3)
    sigs = minhash_signatures(sh, n_perm=8)
    by_doc = {}
    for r in sigs.collect():
        by_doc.setdefault(r["doc_id"], {})[r["i"]] = r["sig"]
    assert len(by_doc[0]) == 8
    assert by_doc[0] == by_doc[1] == by_doc[2]
    # near-dup shares most minhash slots; unrelated shares almost none
    share_near = sum(by_doc[0][i] == by_doc[3][i] for i in range(8))
    share_far = sum(by_doc[0][i] == by_doc[4][i] for i in range(8))
    assert share_near > share_far


def test_lsh_finds_near_dups(docs):
    sh = doc_shingles(docs, k=3)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, n_perm=8), n_bands=4)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    verified = ngram_jaccard_pairs(sh, pairs, threshold=0.5)
    jac = {(r["a_id"], r["b_id"]): r["jaccard"] for r in verified.collect()}
    assert jac[(0, 1)] == 1.0
    if (0, 3) in jac:
        assert 0.5 <= jac[(0, 3)] < 1.0


def test_jaccard_all_pairs(docs):
    sh = doc_shingles(docs, k=3)
    jac = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in ngram_jaccard_pairs(sh, None, threshold=0.0).collect()}
    assert jac[(0, 1)] == 1.0
    assert (0, 4) not in jac or jac[(0, 4)] < 0.2


def test_simhash_properties(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    assert sigs[0] == sigs[1] == sigs[2]
    assert all(0 <= s < (1 << 32) for s in sigs.values())

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sigs[0], sigs[3]) < hamming(sigs[0], sigs[4])


def test_connected_components(spark):
    """Chain A (0-1-2-3-4-5, min label must travel the diameter over
    several propagation rounds) + triangle B + isolated pair C."""
    from gigaspark.operators.dedup import connected_components
    pairs = [(i, i + 1) for i in range(5)]          # chain 0..5
    pairs += [(10, 11), (11, 12), (10, 12)]          # triangle
    pairs += [(20, 21)]                              # pair
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {r["id"]: r["label"] for r in connected_components(df).collect()}
    assert {got[i] for i in range(6)} == {0}
    assert {got[i] for i in (10, 11, 12)} == {10}
    assert got[20] == got[21] == 20
    assert len(got) == 11


def test_contamination_overlap(spark):
    """Planted leak: train doc 10 contains an eval doc verbatim (full
    overlap → contaminated); doc 11 shares nothing; doc 12 shares one
    3-gram out of many (below the 10% threshold... unless it isn't —
    pin exact counts); zero-shingle doc 13 is never contaminated."""
    from gigaspark.operators.dedup import contamination_overlap

    ev = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string")
    tr = spark.createDataFrame(
        [(10, "preamble text the secret benchmark answer is forty two exactly trailer"),
         (11, "completely different words with no shared trigram at all here"),
         (13, "too short")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_sh"], r["n_hit"], r["contaminated"])
           for r in contamination_overlap(tr, ev, k=3, threshold_pct=10).collect()}
    # doc 10: 11 words → 9 shingles, 6 hit (the verbatim eval span) → 67% ≥ 10%
    assert got[10] == (9, 6, True)
    assert got[11][1] == 0 and got[11][2] is False
    assert got[13] == (0, 0, False)


def test_repetition_stats(spark):
    """hand-computed bigram repetition: stuffed doc flagged, natural
    doc clean, sub-k doc zeroed."""
    from gigaspark.operators.dedup import repetition_stats

    docs = spark.createDataFrame(
        [(1, "buy now buy now buy now buy now"),  # 7 bigrams, 2 distinct
         (2, "the quick brown fox jumps high"),    # 5 bigrams all distinct
         (3, "one")],                              # no bigrams
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["top_c"],
                         r["dup_pct"], r["top_pct"], r["repetitive"])
           for r in repetition_stats(docs, k=2).collect()}
    assert got[1] == (7, 2, 4, 71, 57, True)   # 'buy now' ×4, 'now buy' ×3
    assert got[2] == (5, 5, 1, 0, 20, True)    # top_pct 20 edges the flag
    assert got[3] == (0, 0, 0, 0, 0, False)


def test_substring_dup_spans(spark):
    from gigaspark.operators.dedup import substring_dup_spans

    shared = "alpha beta gamma delta epsilon"          # one 5-token window
    docs = spark.createDataFrame([
        (1, shared + " one two three four"),            # shares with 2
        (2, "x y " + shared),                           # shares with 1
        (3, "unrelated words only here now and then"),  # no cross-doc window
        (4, "tiny doc"),                                # < 5 tokens
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_windows"], r["n_rep"], r["rep_pct"])
           for r in substring_dup_spans(docs, w=5).collect()}
    assert got[1] == (5, 1, 20)    # 9 tokens -> 5 windows, 1 shared
    assert got[2] == (3, 1, 33)    # 7 tokens -> 3 windows
    assert got[3] == (3, 0, 0)
    assert got[4] == (0, 0, 0)


def test_leakage_safe_split_property(spark):
    """No near-dup cluster straddles the train/eval boundary, and the
    split rate is roughly 8/2 over singletons."""
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    df = E.queries()["leakage_safe_split"](spark, "/root/testdata/sf0.001")
    per_cluster = df.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits"))
    assert per_cluster.filter("n_splits > 1").count() == 0
    counts = {r["split"]: r["count"]
              for r in df.groupBy("split").count().collect()}
    total = sum(counts.values())
    assert total == 500
    assert 0.6 < counts.get("train", 0) / total < 0.95


def test_cdx_revisit_storage_savings(spark):
    """Unchanged re-fetches store zero bytes; each doc's digest changes
    exactly when (doc_id+gen) crosses a DIV-3 boundary."""
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as E

    rows = E.queries()["cdx_revisit_dedup"](
        spark, "/root/testdata/sf0.001").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["gen"])
        assert rs[0]["is_revisit"] is False  # first fetch always stored
        for prev, cur in zip(rs, rs[1:]):
            same = (doc_id + prev["gen"]) // 3 == (doc_id + cur["gen"]) // 3
            assert cur["is_revisit"] == same
            assert (cur["stored_bytes"] == 0) == same
