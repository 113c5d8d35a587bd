"""BPE tokenizer tests (gigaspark/operators/bpe.py).

Training is pinned by a hand-traceable corpus (merge order verified
against the textbook algorithm by hand); encoding is checked for
losslessness (tokens concatenate back to word+EOW — guaranteed by the
merge construction, asserted by property test) and for
lower-is-better monotonicity (more merges never increase the token
count of any word).
"""

import numpy as np
import pytest

from gigaspark.operators.bpe import (
    EOW, bpe_token_stats, encode_word, train_bpe, word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string")


def test_train_merge_order_hand_traced(spark):
    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 (the
    # classic Sennrich example shape).  Pairs at count 9: (e,s), (s,t),
    # (t,EOW); the pinned tie-break is lexicographic MAX of the pair,
    # and EOW (U+2581) sorts above letters, so suffix merges win first:
    # (t,EOW) → (s,tEOW) → (e,stEOW), then the count-7 (o,w) → (l,ow).
    texts = ["low " * 5, "lower " * 2, "newest " * 6, "widest " * 3]
    merges = train_bpe(_docs(spark, texts), n_merges=5)
    assert merges == [("t", EOW), ("s", "t" + EOW), ("e", "st" + EOW),
                      ("o", "w"), ("l", "ow")]


def test_encode_applies_rank_order(spark):
    texts = ["low " * 5, "lower " * 2, "newest " * 6, "widest " * 3]
    merges = train_bpe(_docs(spark, texts), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest" + EOW]   # fully merged
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    # unseen word falls back to chars + EOW pieces
    toks = encode_word("zq", ranks)
    assert "".join(toks) == "zq" + EOW


def test_encode_lossless_property(spark):
    rng = np.random.default_rng(0)
    words = ["".join(rng.choice(list("abcdef"), rng.integers(1, 12)))
             for _ in range(300)]
    merges = train_bpe(_docs(spark, [" ".join(words)]), n_merges=60)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        assert "".join(encode_word(w, ranks)) == w + EOW


def test_more_merges_never_longer(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 10]
    m_few = train_bpe(_docs(spark, texts), n_merges=5)
    m_many = train_bpe(_docs(spark, texts), n_merges=50)
    assert m_many[:5] == m_few            # prefix-stable training
    r_few = {p: i for i, p in enumerate(m_few)}
    r_many = {p: i for i, p in enumerate(m_many)}
    for w in ("the", "quick", "jumps", "lazy"):
        assert len(encode_word(w, r_many)) <= len(encode_word(w, r_few))


def test_token_stats_operator(spark):
    texts = ["aaa bbb aaa", "", "aaa"]
    docs = _docs(spark, texts)
    merges = train_bpe(docs, n_merges=4)
    got = {r["doc_id"]: r for r in bpe_token_stats(docs, merges).collect()}
    assert got["d0"]["n_words"] == 3 and got["d0"]["n_chars"] == 9
    assert got["d1"]["n_words"] == 0 and got["d1"]["n_bpe_tokens"] == 0
    # "aaa" merges to few tokens; counts consistent across docs
    per_aaa = got["d2"]["n_bpe_tokens"]
    assert got["d0"]["n_bpe_tokens"] == 2 * per_aaa + len(
        encode_word("bbb", {p: i for i, p in enumerate(merges)}))


def test_word_counts_distributed(spark):
    docs = _docs(spark, ["a b  a", "B a\tb"])
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == {"a": 3, "b": 3}


def test_replay_in_order_equals_canonical(spark):
    """The oracle encodes by replaying merges in creation order
    (chained replace); the operator encodes by the iterative
    lowest-rank loop.  For training-produced merges these are
    equivalent — property-checked on random words incl. unseen ones."""
    rng = np.random.default_rng(7)
    corpus_words = ["".join(rng.choice(list("abcd"), rng.integers(1, 10)))
                    for _ in range(200)]
    merges = train_bpe(_docs(spark, [" ".join(corpus_words)]), n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}

    def replay(word):
        units = list(word) + [EOW]
        for a, b in merges:          # creation order, global leftmost
            i = 0
            while i < len(units) - 1:
                if units[i] == a and units[i + 1] == b:
                    units[i:i + 2] = [a + b]
                else:
                    i += 1
        return units

    test_words = corpus_words + [
        "".join(rng.choice(list("abcde"), rng.integers(1, 12)))
        for _ in range(300)]         # incl. unseen letters/words
    for w in test_words:
        assert replay(w) == encode_word(w, ranks), w
