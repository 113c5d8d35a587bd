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
    # normalization folds case; punctuation SEPARATES under the pinned
    # Unicode rule set (rule 4: token chars are \p{L}\p{M}\p{N})
    assert ("quick", 4, 0) in rows and ("fox", 4, 2) in rows
    assert not any(t == "fox!" for t, _, _ in rows)


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
    # docs with BOTH terms: 1 (1+1), 2 (2+1), 5 (1+3), 4 (1+1 — the
    # pinned Unicode rule set separates the '!', so doc4 HAS fox now)
    assert got == [(5, 4), (2, 3), (1, 2), (4, 2)]


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


def test_diversity_ranks(spark):
    """hand-computed adjacency diversity: 'cat' in doc 1 neighbours
    {the, sat, a, mat} → 4 distinct → rank floor(log2(5)) = 2; in doc 2
    the stuffed run 'cat cat cat' self-neighbours don't count."""
    from gigaspark.operators.search import build_postings, diversity_ranks

    docs = spark.createDataFrame(
        [(1, "the cat sat a cat mat"),     # cat @1,4: nbrs the,sat,a,mat → 4
         (2, "cat cat cat dog"),           # cat @0,1,2: only 'dog' → 1
         (3, "cat")],                      # no neighbours → no row
        "doc_id long, text string")
    p = build_postings(docs)
    terms = spark.createDataFrame([("cat",)], "term string")
    ranks = {r["doc_id"]: r["diversity_rank"]
             for r in diversity_ranks(p, terms).collect()}
    assert ranks[1] == 2      # floor(log2(4+1)) = 2
    assert ranks[2] == 1      # floor(log2(1+1)) = 1
    assert 3 not in ranks


def test_search_ranked_full_score_shape(spark):
    """full rank-mix is deterministic and monotone: stuffing a term
    (high spam share) must not outrank a diverse natural doc from the
    same site with equal tf."""
    from gigaspark.operators.search import (
        build_postings, search_ranked_full, site_ranks,
    )

    docs = spark.createDataFrame(
        [(1, "apple pie with apple sauce and apple cake on the table", "s1"),
         (2, "apple apple apple", "s1"),
         (3, "no match here", "s1")],
        "doc_id long, text string, source string")
    p = build_postings(docs)
    terms = spark.createDataFrame([("apple",)], "term string")
    doc_sites = docs.select("doc_id", F.col("source").alias("site"))
    res = search_ranked_full(p, terms, doc_sites,
                             site_ranks(docs), k=10).collect()
    ids = [r["doc_id"] for r in res]
    assert set(ids) == {1, 2}
    assert ids[0] == 1                      # diverse doc wins
    scores = {r["doc_id"]: r["score"] for r in res}
    assert scores[1] > scores[2] > 0


def test_spell_correct(spark):
    """Speller pinned rule: highest-popularity term within distance 1,
    tie term-asc, self-match (distance 0) allowed, no candidate → NULL."""
    from gigaspark.operators.search import spell_correct, vocab_freqs

    p = build_postings(_docs(spark))
    vocab = vocab_freqs(p)
    qs = spark.createDataFrame(
        [("quik",),     # → quick (dist 1)
         ("fox",),      # self-match, dist 0 ('fox!' no longer a term)
         ("lazi",),     # → lazy
         ("zzzzzz",)],  # no candidate within dist 1
        "qterm string")
    got = {r["qterm"]: (r["corrected"], r["freq"])
           for r in spell_correct(vocab, qs, max_dist=1).collect()}
    assert got["quik"] == ("quick", 5)
    assert got["fox"] == ("fox", 6)    # doc4's "FOX!" now tokenizes to fox
    assert got["lazi"] == ("lazy", 2)
    assert got["zzzzzz"] == (None, None)


def test_spell_correct_popularity_tiebreak(spark):
    """equal-distance candidates resolve by freq desc, then term asc."""
    from gigaspark.operators.search import spell_correct, vocab_freqs

    docs = spark.createDataFrame(
        [(1, "cat cat cab bat"), (2, "cab bat")], "doc_id long, text string")
    vocab = vocab_freqs(build_postings(docs))
    qs = spark.createDataFrame([("caz",), ("bab",)], "qterm string")
    got = {r["qterm"]: (r["corrected"], r["freq"])
           for r in spell_correct(vocab, qs, max_dist=1).collect()}
    assert got["caz"] == ("cab", 2)   # cat(2) vs cab(2): freq tie → 'cab' < 'cat'
    assert got["bab"] == ("bat", 2)   # bat(2) vs cab(2): freq tie → 'bat' < 'cab'


def test_langweight_reranks_before_cut(spark):
    """m_sameLangWeight semantics: the boost applies BEFORE the top-k
    cut, so a same-language doc overtakes a slightly-better foreign
    doc; foreign docs keep their unweighted score."""
    from gigaspark.operators.search import (search_bm25, search_langweight,
                                            vocab_freqs)  # noqa: F401

    docs = spark.createDataFrame(
        [(1, "cat cat dog", "fr"), (2, "cat dog dog", "en"),
         (3, "cat mouse mouse", "en"), (4, "bird bird bird", "fr")],
        "doc_id long, text string, lang string")
    p = build_postings(docs)
    terms = spark.createDataFrame([("cat",)], "term string")
    langs = docs.select("doc_id", "lang")

    base = {r.doc_id: r.score for r in search_bm25(p, terms, k=4).collect()}
    got = search_langweight(p, terms, langs, "en", weight=1.2, k=4).collect()
    w = {r.doc_id: (r.score, r.lang) for r in got}
    assert set(w) == {1, 2, 3}                      # doc 4 has no 'cat'
    assert w[1][0] == base[1]                       # fr: unweighted
    assert w[2][0] == round(base[2] * 1.2, 4)       # en: boosted
    # boosted en docs outrank the higher-tf fr doc after the blend
    order = [r.doc_id for r in got]
    assert order.index(2) < order.index(1) or base[2] * 1.2 <= base[1]


def test_spell_symspell_matches_broadcast_variant(spark):
    """The symmetric-delete key join must produce EXACTLY the same
    corrections as the broadcast levenshtein scan — the deletion-key
    candidate set is complete for distance ≤ 1 by construction."""
    from gigaspark.operators.search import (spell_correct,
                                            spell_correct_symspell,
                                            vocab_freqs)

    p = build_postings(_docs(spark))
    vocab = vocab_freqs(p)
    qs = spark.createDataFrame(
        [("quik",), ("fox",), ("lazi",), ("zzzzzz",), ("a",), ("og",)],
        "qterm string")
    want = sorted(map(tuple, spell_correct(vocab, qs, 1).collect()))
    got = sorted(map(tuple, spell_correct_symspell(vocab, qs, 1).collect()))
    assert got == want


def test_spell_symspell_no_broadcast_of_query_side(spark):
    """Scale audit: the candidate join must be a shuffle equi-join on
    the deletion key — neither side broadcast, no nested-loop."""
    from gigaspark.operators.search import (spell_correct_symspell,
                                            vocab_freqs)

    vocab = vocab_freqs(build_postings(_docs(spark)))
    qs = spark.createDataFrame([("quik",)], "qterm string")
    plan = (spell_correct_symspell(vocab, qs, 1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan


def test_search_site_restriction(spark):
    """site: operator keeps only the named site's docs, scored as AND."""
    from gigaspark.operators.search import search_site

    docs = spark.createDataFrame(
        [(1, "quick fox", "a.com"), (2, "quick quick fox", "a.com"),
         (5, "fox fox fox quick", "b.com")],
        "doc_id long, text string, source string")
    p = build_postings(docs)
    terms = spark.createDataFrame([("quick",), ("fox",)], "term string")
    doc_sites = docs.select("doc_id", F.col("source").alias("site"))
    only_a = spark.createDataFrame([("a.com",)], "site string")
    got = [(r["doc_id"], r["score"])
           for r in search_site(p, terms, doc_sites, only_a, k=10).collect()]
    assert got == [(2, 3), (1, 2)]   # doc 5 (b.com) excluded despite top score


def test_synonym_expansion_and_weighted_search(spark):
    """expansion keeps only in-vocab variants; exact term outweighs them."""
    from gigaspark.operators.search import (expand_synonyms, search_weighted,
                                            vocab_freqs)

    docs = spark.createDataFrame(
        [(1, "cat cat cat"), (2, "cats cats cats cats"), (3, "dog dogs")],
        "doc_id long, text string")
    p = build_postings(docs)
    vocab = vocab_freqs(p)
    terms = spark.createDataFrame([("cat",)], "term string")
    exp = {r["term"]: r["w"] for r in expand_synonyms(vocab, terms).collect()}
    assert exp == {"cat": 2, "cats": 1}       # 'dogs' not reachable from 'cat'
    wterms = expand_synonyms(vocab, terms)
    got = [(r["doc_id"], r["score"])
           for r in search_weighted(p, wterms, k=10).collect()]
    # doc 1: 3 'cat' ×2 = 6; doc 2: 4 'cats' ×1 = 4; exact term wins
    assert got == [(1, 6), (2, 4)]


def test_synonym_singular_strip(spark):
    """a plural query term expands DOWN to its singular when in vocab."""
    from gigaspark.operators.search import expand_synonyms, vocab_freqs

    docs = spark.createDataFrame([(1, "dog dogs s")], "doc_id long, text string")
    vocab = vocab_freqs(build_postings(docs))
    terms = spark.createDataFrame([("dogs",), ("s",)], "term string")
    exp = {r["term"]: r["w"] for r in expand_synonyms(vocab, terms).collect()}
    # 'dogs'→{dogs:2, dog:1}; bare 's' must NOT strip to empty string
    assert exp == {"dogs": 2, "dog": 1, "s": 2}


def test_anchor_text_retrieval(spark):
    """inlink anchor terms (src's first tokens) score into the TARGET
    doc at half the weight of body hits."""
    from gigaspark.operators.search import (anchor_postings,
                                            search_with_anchors)

    docs = spark.createDataFrame(
        [(1, "fox news daily"), (2, "quick brown dog"), (3, "fox fox")],
        "doc_id long, text string")
    p = build_postings(docs)
    # doc1 links to doc2; doc3 links to doc2
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    anch = anchor_postings(p, edges, max_pos=2)
    got = {(r["doc_id"], r["term"]): r["atf"] for r in anch.collect()}
    # doc2 receives fox/news/daily from doc1 and fox(x2) from doc3
    assert got[(2, "fox")] == 3 and got[(2, "news")] == 1
    terms = spark.createDataFrame([("fox",)], "term string")
    res = [(r["doc_id"], r["score"]) for r in
           search_with_anchors(p, anch, terms, k=10).collect()]
    # doc3 body 2×2=4; doc2 anchors 3×1=3; doc1 body 1×2=2
    assert res == [(3, 4), (2, 3), (1, 2)]


def test_pair_proximity_and_search(spark):
    from gigaspark.operators.search import pair_proximity, search_proximity

    p = build_postings(_docs(spark))
    terms = spark.createDataFrame([("quick",), ("fox",)], "term string")
    dmin = {(r["doc_id"], r["ta"], r["tb"]): r["dmin"]
            for r in pair_proximity(p, terms).collect()}
    # doc1 "the quick brown fox ...": quick@1, fox@3 -> dmin 2
    assert dmin[(1, "fox", "quick")] == 2
    # doc2 "the quick quick fox": quick@1,2 fox@3 -> dmin 1
    assert dmin[(2, "fox", "quick")] == 1
    # doc5 "fox fox fox quick": fox@0,1,2 quick@3 -> dmin 1
    assert dmin[(5, "fox", "quick")] == 1

    got = [(r["doc_id"], r["score"])
           for r in search_proximity(p, terms, k=10).collect()]
    # score = tfsum + max(0, 16 - dmin):
    # doc5: 4 + 15 = 19; doc2: 3 + 15 = 18; doc4: 2 + 14 = 16 (quick@0
    # fox@2 — '!' separates under the Unicode rule set); doc1: 2 + 14 = 16
    assert got == [(5, 19), (2, 18), (1, 16), (4, 16)]


def test_latest_doc_versions(spark):
    from gigaspark.operators.search import latest_doc_versions

    rows = [
        (1, 0, False, "old one"), (1, 1, False, "new one"),   # update wins
        (2, 0, False, "kept"),                                 # untouched
        (3, 0, False, "gone"), (3, 1, True, ""),               # deleted
        (4, 0, False, "was"), (4, 1, False, "tie"),
        (4, 1, True, ""),                                      # tombstone ties win
        (5, 1, True, ""),                                      # born dead
    ]
    v = spark.createDataFrame(
        rows, "doc_id long, gen int, deleted boolean, text string")
    got = {r["doc_id"]: (r["gen"], r["text"])
           for r in latest_doc_versions(v).collect()}
    assert got == {1: (1, "new one"), 2: (0, "kept")}


def test_suggest_prefix(spark):
    from gigaspark.operators.search import (
        build_postings, suggest_prefix, vocab_freqs)

    vocab = vocab_freqs(build_postings(_docs(spark)))
    pref = spark.createDataFrame([("qu",), ("fo",), ("zz",)], "prefix string")
    got = {(r["prefix"], r["rn"]): (r["term"], r["freq"])
           for r in suggest_prefix(vocab, pref, k=2).collect()}
    # fox: docs 1,2,4,5(x3) -> freq 6 (doc4's '!' separates under the
    # Unicode rule set, so 'fox!' is no longer in the vocabulary)
    assert got[("fo", 1)] == ("fox", 6)
    assert ("fo", 2) not in got
    assert got[("qu", 1)][0] == "quick"
    assert ("zz", 1) not in got


def test_min_cover_window_vs_bruteforce(spark):
    """All-term minimal covering window equals the O(m^n) brute force
    over every combination of one occurrence per term."""
    import itertools

    from gigaspark.operators.search import min_cover_window, search_window

    docs = [
        (1, "a x x b x c"),            # a@0 b@3 c@5 -> span 5
        (2, "a b c"),                  # span 2
        (3, "c x a b x x a x c"),      # best a@6? a@2,6 b@3 c@0,8: {a2,b3,c0}=3 {a6? b3 c8}=5 -> 3
        (4, "a a a b b c"),            # a@2 b@4? best {a2,b3,c5}=3
        (5, "a b x"),                  # missing c -> no row
        (6, "c b a"),                  # span 2 (order-free)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = build_postings(df)
    terms = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    got = {r["doc_id"]: r["span"]
           for r in min_cover_window(p, terms).collect()}

    # brute force on the same tokenization
    toks = {d: t.split() for d, t in docs}
    want = {}
    for d, ts in toks.items():
        occ = {w: [i for i, x in enumerate(ts) if x == w] for w in "abc"}
        if all(occ[w] for w in "abc"):
            want[d] = min(max(c) - min(c)
                          for c in itertools.product(*occ.values()))
    assert got == want

    res = [(r["doc_id"], r["score"], r["span"])
           for r in search_window(p, terms, k=10).collect()]
    # scores: tfsum + max(0, 32 - span); AND semantics drop doc 5
    tfs = {d: sum(len(v) for v in
                  {w: [i for i, x in enumerate(toks[d]) if x == w]
                   for w in "abc"}.values()) for d in want}
    expect = sorted(((d, tfs[d] + max(0, 32 - s), s)
                     for d, s in want.items()),
                    key=lambda t: (-t[1], t[0]))
    assert res == expect


def test_hybrid_rrf_law(spark):
    """RRF fuses two ranked lists exactly: shared docs sum both
    reciprocal terms, single-list docs get one, order by fused score."""
    from gigaspark.operators.search import search_hybrid_rrf
    from pyspark.sql import functions as F

    text = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "doc_id long, score double")
    vec = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, v_rank int")
    got = {r["doc_id"]: r for r in
           search_hybrid_rrf(text, vec, k=10, depth=50).collect()}
    S = 1_000_000_000
    assert got[2]["rrf"] == S // 62 + S // 61      # t_rank 2, v_rank 1
    assert got[1]["rrf"] == S // 61                # text only
    assert got[4]["rrf"] == S // 62                # vector only
    assert got[3]["rrf"] == S // 63
    assert got[2]["t_rank"] == 2 and got[2]["v_rank"] == 1
    assert got[1]["v_rank"] == 0                   # missing side = 0
    ordered = sorted(got.values(), key=lambda r: (-r["rrf"], r["doc_id"]))
    assert [r["doc_id"] for r in ordered][0] == 2  # both lists wins


def test_search_summary_dedup_planted(spark):
    """Planted near-identical summaries: docs 1/2 share a summary
    window (dup collapses to the higher-ranked), doc 3's differs."""
    from gigaspark.operators.search import (build_postings,
                                            search_summary_dedup)

    docs = spark.createDataFrame(
        [(1, "alpha beta shared window of common words here beta"),
         (2, "alpha beta shared window of common words here extra"),
         (3, "alpha beta totally different tail content nothing alike"),
         (4, "no match here at all")],
        "doc_id long, text string")
    postings = build_postings(docs)
    terms = spark.createDataFrame([("alpha",), ("beta",)], "term string")
    snip = spark.createDataFrame([("alpha",)], "term string")
    out = {r["doc_id"]: r for r in search_summary_dedup(
        postings, docs, terms, snip, k=10, sim_threshold=800).collect()}
    assert set(out) == {1, 2, 3}          # doc 4 fails the AND match
    # doc 1 ranks above doc 2 (score tie -> min doc_id); 2 dups onto 1
    assert not out[1]["is_dup"] and out[1]["dup_of"] is None
    assert out[2]["is_dup"] and out[2]["dup_of"] == 1
    assert out[2]["best_sim"] >= 800
    assert not out[3]["is_dup"]
    assert out[3]["best_sim"] < 800


def test_summary_dedup_chain_vs_onejoin(spark):
    """The kept-chain law (VERDICT r4 item 5): a result that is itself a
    DUP must not shadow later results.  Planted: A (rank 1) kept; B
    similar to A -> dup; C similar to B but NOT to A -> the one-join
    variant (all-higher-ranked) marks C dup-of-B, the chain variant
    KEEPS C because B is not kept."""
    from gigaspark.operators.search import (
        build_postings, search_summary_dedup, search_summary_dedup_chain)

    # scoring terms: qx qy (df 3 each); snippet term = qx.
    # summaries are the 60 chars around ' qx ': A and B share a window;
    # C's window overlaps B's heavily but A's barely.
    docs = spark.createDataFrame(
        [(1, "qx qy alpha beta gamma delta epsilon zeta eta theta "
             "qx qy qx qy"),                     # A: highest score (tf 3+3)
         (2, "qx qy alpha beta gamma delta epsilon zeta eta theta "
             "qx qy"),                           # B: shares A's window
         (3, "qx qy iota kappa lam mu nu xi omicron pi rho sigma")],
        "doc_id long, text string")
    postings = build_postings(docs)
    terms = spark.createDataFrame([("qx",), ("qy",)], "term string")
    snip = spark.createDataFrame([("qx",)], "term string")

    one = {r["doc_id"]: r for r in search_summary_dedup(
        postings, docs, terms, snip, k=10, sim_threshold=500).collect()}
    chain = {r["doc_id"]: r for r in search_summary_dedup_chain(
        postings, docs, terms, snip, k=10, sim_threshold=500).collect()}

    assert not one[1]["is_dup"] and not chain[1]["is_dup"]
    assert one[2]["is_dup"] and chain[2]["is_dup"]
    assert chain[2]["dup_of"] == 1
    # doc 3 shares the ' qx qy ' head with both; craft check: whatever
    # the one-join says, the chain only ever cites KEPT results
    for r in chain.values():
        if r["is_dup"]:
            assert not chain[r["dup_of"]]["is_dup"], \
                "chain dup_of must reference a KEPT result"
    # and on the non-planted invariant both agree about the top hit
    assert chain[1]["best_sim"] == 0
