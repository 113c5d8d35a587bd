"""CCNet LM-perplexity filter: brute-force parity + behavioral checks.

The brute-force oracle reimplements train/score/bucket in plain Python
with exact integer log-prob pinning, independent of both Spark and
DuckDB, so a bug shared by the query and its SQL oracle would still be
caught here.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gigaspark.operators.lmfilter import (ALPHABET_V, ccnet_buckets,
                                          score_nll, train_char_bigram_lm)

DOCS = [
    # clean English-ish (train slice: lang='en')
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (3, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (5, "a scan of the table returns rows in sorted key order", "en"),
    (8, "the merge of sorted runs is a k way heap over parts", "en"),
    (10, "rows and keys and parts and runs the usual words", "en"),
    (13, "the the the quick quick table scan scan scan", "en"),
    # gibberish / foreign: scored but not trained on
    (1, "zzxq qqzx xqzz qzqz zxzx qxqx", "xx"),
    (4, "wvkj jvkw kwjv vjwk wkvj", "xx"),
    (6, "mmmppp pppmmm mpmpmp", "xx"),
    (18, "zqzqzqzq xjxjxjxj vkvkvkvk", "xx"),
    # punctuation-heavy (normalisation must strip it)
    (2, "the, quick... brown!! fox?? (jumps)", "en"),
    # too short after normalisation: emits no row
    (7, "!?.,;", "en"),
    (9, "x", "en"),
]


def _norm(s: str) -> str:
    s = re.sub(r"[^A-Za-z0-9 ]+", " ", s).lower()
    s = re.sub(r" {2,}", " ", s).strip()
    return s


def _bigrams(s: str):
    t = _norm(s)
    return [t[i:i + 2] for i in range(len(t) - 1)]


def _pin(x: float) -> int:
    # HALF_UP (away from zero), matching Spark round / DuckDB round
    v = x * 10000
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _brute():
    cab = Counter(b for d, s, l in DOCS if l == "en" for b in _bigrams(s))
    ca = Counter()
    for b, c in cab.items():
        ca[b[0]] += c
    model = {b: _pin(math.log((c + 1.0) / (ca[b[0]] + ALPHABET_V)))
             for b, c in cab.items()}
    miss = {c0: _pin(math.log(1.0 / (n + ALPHABET_V)))
            for c0, n in ca.items()}
    cold = _pin(math.log(1.0 / ALPHABET_V))
    out = {}
    for d, s, _l in DOCS:
        bgs = _bigrams(s)
        if not bgs:
            continue
        nll = -sum(model.get(b, miss.get(b[0], cold)) for b in bgs)
        out[d] = (nll, len(bgs))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_score_matches_bruteforce(spark, docs_df):
    model, ctx = train_char_bigram_lm(docs_df, train_lang="en")
    got = {r.doc_id: (r.nll10k, r.n_bigrams)
           for r in score_nll(docs_df, model, ctx).collect()}
    assert got == _brute()


def test_short_docs_emit_no_row(spark, docs_df):
    model, ctx = train_char_bigram_lm(docs_df, train_lang="en")
    ids = {r.doc_id for r in score_nll(docs_df, model, ctx).collect()}
    assert 7 not in ids and 9 not in ids


def test_buckets_separate_clean_from_gibberish(spark, docs_df):
    rows = ccnet_buckets(docs_df, train_lang="en", sample_mod=5).collect()
    by = {r.doc_id: r.bucket for r in rows}
    # every in-model clean doc must score a lower mean NLL than every
    # out-of-model gibberish doc — so no gibberish doc lands in 'head'
    # while a trained-on doc lands in 'tail'
    means = {r.doc_id: r.nll10k / r.n_bigrams for r in rows}
    clean = [means[d] for d, _s, l in DOCS if l == "en" and d in means]
    noise = [means[d] for d, _s, l in DOCS if l == "xx"]
    assert max(clean) < min(noise)
    assert {by[d] for d, _s, l in DOCS if l == "xx"} <= {"middle", "tail"}
    # buckets ordered: head cutoff <= middle cutoff by construction
    assert set(by.values()) <= {"head", "middle", "tail"}


def test_bucket_cutoffs_from_sample_are_tertiles(spark, docs_df):
    rows = ccnet_buckets(docs_df, train_lang="en", sample_mod=5).collect()
    means = sorted((r.nll10k / r.n_bigrams, r.doc_id, r.bucket) for r in rows)
    # bucket labels must be monotone along the mean-NLL order
    labels = [b for _m, _d, b in means]
    order = {"head": 0, "middle": 1, "tail": 2}
    assert labels == sorted(labels, key=order.__getitem__)


def test_perlang_buckets_are_per_language(spark):
    """The per-language variant must bucket each language against its
    OWN distribution: a language whose docs all look 'foreign' to
    English still gets head/middle/tail members, and every language
    with ≥ 3 sampled docs produces all three buckets across a spread."""
    from gigaspark.operators.lmfilter import ccnet_buckets_perlang

    rows = []
    for lang, words in (("en", "the quick brown fox jumps over the dog"),
                        ("xx", "zq xj vk wm qz jx kv mw")):
        for i in range(30):
            # doc_ids interleave langs; vary repetition for a spread
            rows.append((i * 2 + (0 if lang == "en" else 1),
                         " ".join([words] * (1 + i % 5)) +
                         " filler" * (i % 7), lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets_perlang(df, sample_mod=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.bucket)
    # each language buckets against itself — both see head AND tail
    assert {"head", "tail"} <= by_lang["en"]
    assert {"head", "tail"} <= by_lang["xx"]


def test_dsir_selects_target_like_docs(spark):
    """Importance log-ratio: docs drawn from the target distribution
    must dominate the selected quartile; pure-noise docs must not be
    selected.  n_bigrams cancels structurally, so logratio10k is an
    exact integer difference of the two models' integer sums."""
    from gigaspark.operators.lmfilter import dsir_logratio

    rows = []
    for i in range(24):
        rows.append((i * 2, "the quick brown fox jumps over the dog "
                     + "word" * (i % 3), "en"))
        rows.append((i * 2 + 1, "zq xj vk wm qz jx kv mw "
                     + "zzxq" * (i % 3), "xx"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_logratio(df, target_lang="en", sample_mod=5).collect()
    lang = {d: l for d, _t, l in rows}
    sel = [r.doc_id for r in out if r.selected]
    assert sel and all(lang[d] == "en" for d in sel)
    # target-like docs have strictly higher mean log-ratio than noise
    means = {r.doc_id: r.logratio10k / r.n_bigrams for r in out}
    en = [m for d, m in means.items() if lang[d] == "en"]
    xx = [m for d, m in means.items() if lang[d] == "xx"]
    assert min(en) > max(xx)


def test_caption_gate_all_integer_decision(spark, docs_df):
    from gigaspark.operators.lmfilter import caption_ppl_gate

    imgs = spark.createDataFrame(
        [("img1", "the quick brown fox jumps over the dog"),
         ("img2", "zzxq qqzx xqzz qzqz zxzx qxqx wvkj jvkw"),
         ("img3", "!?.,;"),           # normalises to empty: no evidence
         ("img4", "")],
        "image_id string, caption string")
    got = {r.image_id: r for r in
           caption_ppl_gate(imgs, docs_df, train_lang="en",
                            max_mean_nll10k=30000).collect()}
    assert len(got) == 4                       # gate covers EVERY image
    assert got["img1"].cap_ok                  # in-model text passes
    assert not got["img2"].cap_ok              # gibberish fails
    assert not got["img3"].cap_ok and got["img3"].n_bigrams == 0
    assert not got["img4"].cap_ok and got["img4"].nll10k == 0
    # the keep rule is the integer inequality, verbatim
    for r in got.values():
        want = r.n_bigrams > 0 and r.nll10k <= 30000 * r.n_bigrams
        assert r.cap_ok == want


def test_model_is_broadcastable_size(spark, docs_df):
    model, ctx = train_char_bigram_lm(docs_df, train_lang="en")
    assert model.count() <= ALPHABET_V * ALPHABET_V
    assert ctx.count() <= ALPHABET_V


def test_plan_broadcasts_model_and_shuffles_once(spark, docs_df):
    """Scale audit: the scoring plan must broadcast the (tiny) model and
    aggregate on doc_id — the corpus side shuffles once."""
    model, ctx = train_char_bigram_lm(docs_df, train_lang="en")
    plan = (score_nll(docs_df, model, ctx)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
