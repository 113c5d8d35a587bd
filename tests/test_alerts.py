"""Standing-query alerts: saved searches fire on exactly the matching
docs of each micro-batch — cross-checked against the batch compiler's
semantics, through the real writeStream path."""

from __future__ import annotations

import os

import pytest

from gigaspark.streaming.alerts import AlertEngine

DOC_SCHEMA = "doc_id long, text string, site string, lang string"

B0 = [(1, "the quick brown fox", "a.com", "en"),
      (2, "lazy dog sleeps by the river", "b.com", "en"),
      (3, "der schnelle fuchs", "a.com", "de")]
B1 = [(4, "quick quick fox fox", "c.com", "en"),
      (5, "brown bear by the brown river", "b.com", "en")]

QUERIES = {
    "q_fox": "fox -lazy",
    "q_phrase": '"brown fox" OR river',
    "q_site": "quick site:a.com",
    "q_title": "intitle:lazy",
    "q_bool": "river OR (quick fox)",   # nested boolean standing query
}


def _expected():
    # hand-derived per the pinned semantics
    return {
        ("q_fox", 1, 1, 0), ("q_fox", 4, 2, 1),
        ("q_phrase", 1, 1, 0), ("q_phrase", 2, 1, 0), ("q_phrase", 5, 1, 1),
        ("q_site", 1, 1, 0),
        ("q_title", 2, 1, 0),
        ("q_bool", 1, 2, 0), ("q_bool", 2, 1, 0),
        ("q_bool", 4, 4, 1), ("q_bool", 5, 1, 1),
    }


def test_alert_engine_batches(spark, tmp_path):
    eng = AlertEngine(spark, QUERIES, str(tmp_path / "out"))
    for i, rows in enumerate([B0, B1]):
        eng.match_batch(spark.createDataFrame(rows, DOC_SCHEMA), i)
    got = {(r["query_id"], r["doc_id"], r["score"], r["batch_id"])
           for r in eng.matches().collect()}
    assert got == _expected()


def test_alert_engine_writestream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for rows in [B0, B1]:
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    eng = AlertEngine(spark, QUERIES, str(tmp_path / "out"))
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = (stream.writeStream.foreachBatch(eng.sink())
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["query_id"], r["doc_id"], r["score"])
           for r in eng.matches().collect()}
    assert got == {(q_, d, s) for q_, d, s, _ in _expected()}


def test_alert_engine_rejects_sortby(spark, tmp_path):
    with pytest.raises(ValueError):
        AlertEngine(spark, {"bad": "fox gbsortby:n_chars"},
                    str(tmp_path / "out"))


def test_flat_term_with_literal_paren_routes_flat(spark, tmp_path):
    """A bare term containing a paren is a FLAT literal (the flat
    grammar accepts any non-space token) — it must register and match,
    not raise 'unbalanced parenthesis' from the boolean parser."""
    eng = AlertEngine(spark, {"q_lit": "f(x)"}, str(tmp_path / "out"))
    rows = [(7, "compute f(x) now", "a.com", "en"),
            (8, "no match here", "b.com", "en")]
    eng.match_batch(spark.createDataFrame(rows, DOC_SCHEMA), 0)
    got = {(r["query_id"], r["doc_id"]) for r in eng.matches().collect()}
    assert got == {("q_lit", 7)}


def test_matches_dedups_replayed_batch(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a micro-batch re-appends
    identical rows; matches() must still return each alert once."""
    eng = AlertEngine(spark, QUERIES, str(tmp_path / "out"))
    b0 = spark.createDataFrame(B0, DOC_SCHEMA)
    eng.match_batch(b0, 0)
    eng.match_batch(b0, 0)   # replay
    rows = eng.matches().collect()
    assert len(rows) == len(set(map(tuple, rows)))
    got = {(r["query_id"], r["doc_id"], r["score"], r["batch_id"])
           for r in rows}
    assert got == {e for e in _expected() if e[3] == 0}
