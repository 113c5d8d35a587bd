"""Query-tier retrieval: postings, boolean AND/OR/NOT, phrase, top-k
(SURVEY §2.6 T4, §3.2 — Posdb/PosdbTable/TopTree semantics on a corpus
small enough to verify by hand)."""

from __future__ import annotations

import pyspark.sql.functions as F

from gigaspark.operators.search import (
    build_postings, search_and, search_not, search_or, search_phrase,
    term_freqs, tokenize)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "lazy summer days drift by the river"),
    (4, "Quick  Brown   FOX!"),      # normalization: case + whitespace
    (5, "fox fox fox quick"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_positions(spark):
    p = build_postings(_docs(spark))
    rows = {(r["term"], r["doc_id"], r["pos"]) for r in p.collect()}
    assert ("quick", 1, 1) in rows
    assert ("quick", 2, 1) in rows and ("quick", 2, 2) in rows
    # normalization folds case; punctuation stays attached (whitespace tok)
    assert ("quick", 4, 0) in rows and ("fox!", 4, 2) in rows


def test_term_freqs(spark):
    tf = {(r["term"], r["doc_id"]): r["tf"]
          for r in term_freqs(build_postings(_docs(spark))).collect()}
    assert tf[("quick", 2)] == 2
    assert tf[("fox", 5)] == 3
    assert tf[("the", 1)] == 2


def test_search_and(spark):
    p = build_postings(_docs(spark))
    terms = p.sparkSession.createDataFrame([("quick",), ("fox",)], "term string")
    got = [(r["doc_id"], r["score"]) for r in search_and(p, terms, k=10).collect()]
    # docs with BOTH terms: 1 (1+1), 2 (2+1), 5 (1+3); doc 4 has fox! not fox
    assert got == [(5, 4), (2, 3), (1, 2)]


def test_search_or_and_not(spark):
    p = build_postings(_docs(spark))
    sp = p.sparkSession
    inc = sp.createDataFrame([("lazy",), ("river",)], "term string")
    got_or = {r["doc_id"]: r["score"] for r in search_or(p, inc, k=10).collect()}
    assert got_or == {3: 2, 1: 1}
    exc = sp.createDataFrame([("dog",)], "term string")
    got_not = [r["doc_id"] for r in search_not(p, inc, exc, k=10).collect()]
    assert got_not == [3]  # doc 1 contains 'dog' → banned


def test_search_phrase(spark):
    p = build_postings(_docs(spark))
    got = [(r["doc_id"], r["n_occurrences"])
           for r in search_phrase(p, "quick", "fox", k=10).collect()]
    # adjacency: doc 2 ('quick fox' at pos 2→3), doc 5 (pos 3 'quick' is last → no)
    assert got == [(2, 1)]
    got2 = [(r["doc_id"], r["n_occurrences"])
            for r in search_phrase(p, "fox", "fox", k=10).collect()]
    assert got2 == [(5, 2)]  # fox fox fox → two overlapping adjacencies


def test_topk_bounded(spark):
    p = build_postings(_docs(spark))
    terms = p.sparkSession.createDataFrame([("the",), ("fox",), ("quick",)],
                                           "term string")
    assert search_or(p, terms, k=2).count() == 2
