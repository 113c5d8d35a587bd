"""corpus_filter — the composed C4/Gopher keep/drop decision: every
reason branch exercised on crafted documents."""

from __future__ import annotations

from gigaspark.operators.pipeline import corpus_filter

GOOD = ("the quick brown fox jumps over the lazy dog and then "
        "walks along the river with a friend for a while today")

DOCS = [
    (1, GOOD),                                           # keep
    (2, "der hund und die katze sind nicht hier aber der "
        "mann und die frau gehen mit der zeit und der welt"),   # lang (de)
    (3, "the and with !!!!!!!!!!!!!!!!!!"),  # quality: en markers but
                                             # <10 toks + punct-heavy
    (4, ("spam ham " * 30) + "the and with for a of to in is it"),  # repetition
    (5, GOOD),                                           # duplicate of 1
    (6, "the bench mark eval set secret answer key text is "
        "exactly this and the overlap with it is total today"),  # eval member
]


def test_corpus_filter_reasons(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = docs.where("doc_id = 6")
    out = {r["doc_id"]: (r["keep"], r["reason"])
           for r in corpus_filter(docs, ev).collect()}
    assert out[1] == (True, "keep")
    assert out[2] == (False, "lang")
    assert out[3] == (False, "quality")
    assert out[4] == (False, "repetition")
    assert out[5] == (False, "duplicate")
    # the eval member itself is 100% self-contaminated -> dropped
    assert out[6] == (False, "contamination")


def test_corpus_filter_precedence(spark):
    # a doc that is BOTH wrong-lang and repetitive reports 'lang'
    # (pinned precedence: lang -> quality -> repetition -> ...)
    docs = spark.createDataFrame(
        [(1, GOOD), (2, "der und nicht " * 25)],
        "doc_id long, text string")
    ev = docs.where("doc_id < 0")
    out = {r["doc_id"]: r["reason"] for r in corpus_filter(docs, ev).collect()}
    assert out[2] == "lang"
