"""Pinned 4-rule Unicode tokenizer (SURVEY C5 — Unicode.cpp/
Entities.cpp [U][H] parity): entity decode (&amp; last), Unicode
lowercase, CJK unigrams, \\p{L}\\p{M}\\p{N} token chars.  The Spark
(Java regex) and DuckDB (RE2) spellings of the rule set must produce
bit-identical token streams, and on pure ``[a-z0-9 ]`` text the rule
set must reduce to the legacy whitespace-of-norm_text split so every
pinned search oracle stays valid."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from gigaspark.functions.text import norm_text
from gigaspark.operators.search import tokenize

# one string exercising every rule: diacritics, entity table (incl.
# double-escaped &amp;lt;), markup, CJK Han/Katakana (with the Common-
# script prolonged sound mark U+30FC), Hangul, letter+digit token
FIXTURE = ("Café &amp; <b>Über</b> &lt;tag&gt; &#39;ok&#39;"
           " 漢字トークン 한국어"
           " value7 x&amp;lt;y")

EXPECT = ["café", "b", "über", "b", "tag", "ok",
          "漢", "字", "ト", "ー", "ク", "ン",
          "한", "국", "어", "value7", "x", "lt", "y"]


def _spark_tokens(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [r["term"] for r in tokenize(df).orderBy("pos").collect()]


def _duck_tokens(text):
    import __spark_entry__ as E
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id,"
                " ?::VARCHAR AS text", [text])
    sql = ("WITH " + E._POSTINGS_CTE
           + " SELECT term FROM p ORDER BY pos")
    return [r[0] for r in con.sql(sql).fetchall()]


def test_cjk_diacritics_entities(spark):
    assert _spark_tokens(spark, FIXTURE) == EXPECT


def test_cross_engine_bit_parity(spark):
    # distinct-(term,pos) postings from both engines on the fixture
    # (duck side is the postings CTE → distinct; mirror on spark side)
    got_spark = sorted(set(_spark_tokens(spark, FIXTURE)))
    got_duck = sorted(set(_duck_tokens(FIXTURE)))
    assert got_spark == got_duck == sorted(set(EXPECT))


def test_entity_decode_is_single_pass(spark):
    # "&amp;lt;" must become the LITERAL "&lt;" (then '<' and '&' both
    # separate) — never double-decode to a consumed '<'
    assert _spark_tokens(spark, "a&amp;lt;b") == ["a", "lt", "b"]


def test_reduces_to_legacy_split_on_ascii(spark):
    txts = ["the quick  brown fox", "key agg row scan slow", "a7 b8 c9",
            "", "   ", "single"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(txts)],
                               "doc_id long, text string")
    legacy = df.select(
        "doc_id", F.posexplode(F.split(norm_text(F.col("text")), " "))
        .alias("pos", "term")).where(F.col("term") != "")
    new = tokenize(df)
    a = sorted(map(tuple, legacy.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b
