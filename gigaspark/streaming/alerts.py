"""Standing-query alerts: saved searches evaluated continuously over
the incoming document stream (the alerts/percolator pattern — every
engine that crawls continuously grows one; here it is the compiled
query language applied per micro-batch).

Shape: ``readStream`` of documents → ``foreachBatch`` — each batch
builds postings for ITS OWN docs only and runs every registered
query's scoring core (:func:`gigaspark.operators.query_lang.
score_query` — no top-k, matching is per-doc) against them, appending
``(query_id, doc_id, score, batch_id)`` matches to the sink.

Why per-batch postings are the right scale story: a standing query
must fire on every matching NEW doc, so the work per batch is
O(batch · queries), never O(corpus); the registered queries travel as
broadcast literal tables (they are the query, not data).  Corpus-wide
statistics (df ranks, BM25 idf) deliberately play no role — alert
matching is boolean/occurrence semantics, pinned.

Limits (pinned): term/phrase/field/intitle atoms; ``gbsortby:`` and
top-k make no sense for alerts and are rejected at registration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gigaspark.operators.query_lang import (
    ParsedBoolean, ParsedQuery, parse_boolean, parse_query, score_boolean,
    score_query)
from gigaspark.operators.search import build_postings

_OUT_SCHEMA = "query_id string, doc_id long, score long, batch_id long"


def _is_boolean_form(q: str) -> bool:
    """True iff ``q`` uses parens as nested-boolean GROUPING.

    A ``(`` opens a group only when it follows start-of-query,
    whitespace, or another grouping paren; a ``)`` closes a group only
    when one is open.  Parens glued inside a token (``f(x)``, ``:-)``)
    are literals — the flat grammar accepts any non-space token as a
    term — so they must NOT route the query to ``parse_boolean`` (which
    pads every unquoted paren and would raise "unbalanced").  Quoted
    spans are opaque.  Boolean form requires ≥1 group closed and all
    groups closed at end."""
    prev, inq, depth, closed = " ", False, 0, 0
    for ch in q:
        if ch == '"':
            inq = not inq
        elif not inq:
            if ch == "(" and (prev.isspace() or prev in "()"):
                depth += 1
            elif ch == ")" and depth > 0:
                depth -= 1
                closed += 1
        prev = ch
    return closed > 0 and depth == 0


class AlertEngine:
    """Saved searches matched per micro-batch via foreachBatch."""

    def __init__(self, spark: SparkSession, queries: dict[str, str],
                 out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.queries: dict[str, ParsedQuery | ParsedBoolean] = {}
        for qid, q in queries.items():
            # route on GROUPING parens only — a paren glued inside a bare
            # term ("f(x)", ":-)") is a literal the flat grammar accepts
            # (cf. test_parse_colon_nonfield_is_term), not boolean syntax
            if _is_boolean_form(q):
                self.queries[qid] = parse_boolean(q)
                continue
            pq = parse_query(q)
            if pq.sort_by is not None:
                raise ValueError(f"{qid}: gbsortby has no alert semantics")
            self.queries[qid] = pq

    def match_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Evaluate every standing query against this batch's docs.
        ``batch`` needs (doc_id, text, site, lang) columns."""
        postings = build_postings(batch)
        dim_cols = [c for c in batch.columns if c != "text"]
        dim = batch.select(*dim_cols)
        out = None
        for qid, pq in self.queries.items():
            scorer = score_boolean if isinstance(pq, ParsedBoolean) \
                else score_query
            m = scorer(postings, dim, pq).select(
                F.lit(qid).alias("query_id"), "doc_id", "score",
                F.lit(batch_id).cast("long").alias("batch_id"))
            out = m if out is None else out.unionByName(m)
        if out is not None:
            out.write.mode("append").parquet(self.out_dir)

    def sink(self):
        return self.match_batch

    def matches(self) -> DataFrame:
        if not os.path.exists(self.out_dir):
            return self.spark.createDataFrame([], _OUT_SCHEMA)
        # foreachBatch is at-least-once: a retried micro-batch re-appends
        # its (deterministic) rows, so replays are deduped exactly at
        # read time — the same contract StreamingIndex.live_postings pins
        return (self.spark.read.schema(_OUT_SCHEMA)
                .parquet(self.out_dir).distinct())
