"""Query-language parser + compiler (SURVEY §3.2; Query.cpp parity —
quoted phrases, - negation, OR groups, site:/lang: fields) on a corpus
small enough to verify by hand, plus a brute-force cross-check."""

from __future__ import annotations

import pytest

from gigaspark.operators.query_lang import (
    Atom, compile_query, parse_query)
from gigaspark.operators.search import build_postings

DOCS = [
    # (doc_id, text, lang, site)
    (1, "the quick brown fox jumps over the lazy dog", "en", "a.com"),
    (2, "the quick quick fox", "en", "a.com"),
    (3, "lazy summer days drift by the river", "en", "b.com"),
    (4, "Quick  Brown   FOX runs", "de", "b.com"),
    (5, "fox fox fox quick brown", "en", "c.com"),
    (6, "brown bear brown fox brown", "en", "c.com"),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, site string")


def _run(spark, q, k=10):
    import pyspark.sql.functions as F

    docs = _docs(spark)
    postings = build_postings(docs)
    dim = docs.select("doc_id", "site", "lang",
                      F.length("text").alias("n_chars"))
    out = compile_query(postings, dim, q, k=k).collect()
    return [tuple(r[c] for c in out[0].asDict()) for r in out] if out else []


# ---------------------------------------------------------------- parser

def test_parse_units_and_or():
    pq = parse_query("a OR b c")
    assert pq.units == [[Atom("term", ("a",)), Atom("term", ("b",))],
                        [Atom("term", ("c",))]]
    assert pq.excludes == [] and pq.fields == {}


def test_parse_phrase_neg_fields():
    pq = parse_query('"brown fox" -lazy site:a.com -site:b.com lang:EN')
    assert pq.units == [[Atom("phrase", ("brown", "fox"))]]
    assert pq.excludes == [Atom("term", ("lazy",))]
    assert pq.field_in("site") == ["a.com"]
    assert pq.field_not_in("site") == ["b.com"]
    assert pq.field_in("lang") == ["en"]     # values normalized


def test_parse_neg_phrase_and_case():
    pq = parse_query('-"Lazy Dog" Fox')
    assert pq.excludes == [Atom("phrase", ("lazy", "dog"))]
    assert pq.units == [[Atom("term", ("fox",))]]


def test_parse_intitle():
    pq = parse_query("intitle:Fox -intitle:lazy")
    assert pq.units == [[Atom("term", ("fox",), max_pos=4)]]
    assert pq.excludes == [Atom("term", ("lazy",), max_pos=4)]


def test_parse_numeric_ops():
    pq = parse_query("fox gbmin:n_chars:10 gbmax:n_chars:90 gbsortby:n_chars")
    assert pq.numeric == [("n_chars", "min", 10), ("n_chars", "max", 90)]
    assert pq.sort_by == "n_chars"
    for bad in ["fox -gbmin:n_chars:1", "fox gbmin:n_chars:abc",
                "fox gbmin:n_chars"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_colon_nonfield_is_term():
    # unknown field names fall through to content matching (Query.cpp
    # unknown-field fallthrough [U][M]); the corpus tokenizer separates
    # on ':', so the query compiles to the adjacency phrase the index
    # can actually match — never the unmatchable literal 'foo:bar'
    pq = parse_query("foo:bar")
    assert pq.units == [[Atom("phrase", ("foo", "bar"))]]


def test_parse_errors():
    for bad in ["", "   ", '-only', '-a -b', 'site:a.com', '"unclosed',
                'a OR', 'OR a', 'a OR -b', 'a OR site:x', '""']:
        with pytest.raises(ValueError):
            parse_query(bad)


# -------------------------------------------------------------- compiler

def test_compile_and_semantics(spark):
    # both words required; score = tf(quick) + tf(fox)
    got = _run(spark, "quick fox")
    assert got == [(5, 4), (2, 3), (1, 2), (4, 2)]


def test_compile_or_group(spark):
    # (lazy OR river) — doc1 lazy=1, doc3 lazy+river=2
    got = _run(spark, "lazy OR river")
    assert got == [(3, 2), (1, 1)]


def test_compile_phrase_scored_by_occurrences(spark):
    got = _run(spark, '"brown fox"')
    # docs 1/4/6 each contain exactly one adjacent "brown fox"
    # (doc5 ends "... quick brown" — no adjacency)
    assert got == [(1, 1), (4, 1), (6, 1)]


def test_compile_mixed_phrase_term_exclude(spark):
    # "quick" AND "brown fox" minus docs containing runs
    got = _run(spark, 'quick "brown fox" -runs')
    # doc1: tf(quick)=1 + phrase=1; doc4 excluded by -runs; doc5 lacks
    # the phrase; doc6 lacks quick
    assert got == [(1, 2)]


def test_compile_field_restrictions(spark):
    assert _run(spark, "fox lang:de") == [(4, 1)]
    assert _run(spark, "fox site:a.com") == [(1, 1), (2, 1)]
    assert _run(spark, "fox -site:c.com lang:en") == [(1, 1), (2, 1)]


def test_compile_exclude_phrase(spark):
    got = _run(spark, 'fox -"fox fox"')
    assert got == [(1, 1), (2, 1), (4, 1), (6, 1)]


def test_compile_intitle(spark):
    # title window = first 5 tokens; "lazy" is in-title only for doc3
    # (doc1 has lazy at pos 7)
    assert _run(spark, "intitle:lazy") == [(3, 1)]
    # doc2 "the quick quick fox": two in-title quicks
    got = _run(spark, "intitle:quick")
    assert got == [(2, 2), (1, 1), (4, 1), (5, 1)]
    # exclusion scoped to the title window keeps doc1 (lazy at pos 7)
    got = _run(spark, "fox -intitle:lazy")
    assert got == [(5, 3), (1, 1), (2, 1), (4, 1), (6, 1)]


def test_compile_numeric_range_and_sort(spark):
    lens = {d[0]: len(d[1]) for d in DOCS}
    # fox docs: 1,2,4,5,6 — range-restrict then rank by n_chars desc
    lo, hi = lens[2], lens[1]
    got = _run(spark, f"fox gbmin:n_chars:{lo} gbmax:n_chars:{hi} "
                      f"gbsortby:n_chars")
    want = sorted(((d, lens[d]) for d in (1, 2, 4, 5, 6)
                   if lo <= lens[d] <= hi),
                  key=lambda t: (-t[1], t[0]))
    assert [(d, n) for d, _, n in got] == want
    # unknown column -> clear error
    with pytest.raises(ValueError):
        _run(spark, "fox gbsortby:nope")


def test_compile_topk_tiebreak(spark):
    got = _run(spark, "brown", k=2)
    assert got == [(6, 3), (1, 1)]   # score desc, doc_id asc


# ------------------------------------------------- brute-force crosscheck

def _brute(q: str, k: int = 10):
    pq = parse_query(q)
    toks = {d[0]: d[1].lower().split() for d in DOCS}
    meta = {d[0]: {"lang": d[2], "site": d[3]} for d in DOCS}

    def atom_score(a: Atom, words):
        if a.kind == "term":
            scope = words if a.max_pos is None else words[:a.max_pos + 1]
            return sum(1 for w in scope if w == a.words[0])
        n = len(a.words)
        return sum(1 for i in range(len(words) - n + 1)
                   if tuple(words[i:i + n]) == a.words)

    out = []
    for did, words in toks.items():
        ok = True
        for name in ("site", "lang"):
            inc, exc = pq.field_in(name), pq.field_not_in(name)
            if inc and meta[did][name] not in inc:
                ok = False
            if meta[did][name] in exc:
                ok = False
        if any(atom_score(a, words) for a in pq.excludes):
            ok = False
        if not ok:
            continue
        score, matched = 0, 0
        for unit in pq.units:
            s = sum(atom_score(a, words) for a in unit)
            if s:
                matched += 1
                score += s
        if matched == len(pq.units):
            out.append((did, score))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


@pytest.mark.parametrize("q", [
    "quick fox",
    "lazy OR river",
    '"brown fox" OR river',
    'quick "brown fox" -runs',
    "fox -site:c.com lang:en",
    'brown OR "quick quick" -bear',
    '"fox fox fox"',
    "the quick OR lazy -summer site:a.com",
    "intitle:fox OR lazy -intitle:bear",
    'intitle:brown "quick brown" lang:en',
])
def test_compile_matches_bruteforce(spark, q):
    assert _run(spark, q) == _brute(q)


# ------------------------------------------------------- property fuzz

from hypothesis import given, settings, strategies as st

_WORDS = ["quick", "brown", "fox", "lazy", "river", "bear", "zz"]
_ATOMS = (
    [w for w in _WORDS]
    + [f"-{w}" for w in _WORDS[:4]]
    + ['"quick brown"', '"brown fox"', '-"fox fox"',
       "site:a.com", "site:c.com", "-site:b.com", "lang:en",
       "intitle:quick", "-intitle:lazy", "OR"]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from(_ATOMS), min_size=1, max_size=6))
def test_parse_or_reject_is_total(tokens):
    """parse_query either returns a structure or raises ValueError —
    never any other exception — on arbitrary token sequences."""
    q = " ".join(tokens)
    try:
        pq = parse_query(q)
    except ValueError:
        return
    assert pq.units  # accepted queries always have a scoring unit


@pytest.mark.parametrize("seed", range(6))
def test_random_queries_match_bruteforce(spark, seed):
    """Deterministic pseudo-random queries (seeded, no runtime RNG in
    the engine itself) compile to plans matching the brute force."""
    import random

    rng = random.Random(seed)
    accepted = []
    while len(accepted) < 3:
        q = " ".join(rng.choice(_ATOMS) for _ in range(rng.randint(1, 5)))
        try:
            parse_query(q)
        except ValueError:
            continue
        accepted.append(q)
    for q in accepted:
        assert _run(spark, q) == _brute(q), f"mismatch for {q!r}"


# ------------------------------------------- nested boolean (parens)

from gigaspark.operators.query_lang import (  # noqa: E402
    BoolNode, compile_boolean, parse_boolean)


def _run_bool(spark, q, k=10):
    import pyspark.sql.functions as F

    docs = _docs(spark)
    postings = build_postings(docs)
    dim = docs.select("doc_id", "site", "lang",
                      F.length("text").alias("n_chars"))
    return [(r["doc_id"], r["score"])
            for r in compile_boolean(postings, dim, q, k=k).collect()]


def _brute_bool(q, k=10):
    pb = parse_boolean(q)
    toks = {d[0]: d[1].lower().split() for d in DOCS}
    meta = {d[0]: {"lang": d[2], "site": d[3]} for d in DOCS}

    def atom_score(a, words):
        if a.kind == "term":
            scope = words if a.max_pos is None else words[:a.max_pos + 1]
            return sum(1 for w in scope if w == a.words[0])
        n = len(a.words)
        return sum(1 for i in range(len(words) - n + 1)
                   if tuple(words[i:i + n]) == a.words)

    def admit(node, scores):
        if node.op == "ATOM":
            return scores[node.atom_id] > 0
        vals = [admit(c, scores) for c in node.children]
        return all(vals) if node.op == "AND" else any(vals)

    out = []
    for did, words in toks.items():
        ok = True
        for name in ("site", "lang"):
            inc, exc = pb.field_in(name), pb.field_not_in(name)
            if inc and meta[did][name] not in inc:
                ok = False
            if meta[did][name] in exc:
                ok = False
        if any(atom_score(a, words) for a in pb.excludes):
            ok = False
        if not ok:
            continue
        scores = [atom_score(a, words) for a in pb.atoms]
        if not admit(pb.tree, scores):
            continue
        if sum(scores) == 0:
            continue  # unreachable: admitted trees imply >=1 match
        out.append((did, sum(s for s in scores if s > 0)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_parse_boolean_tree_shape():
    pb = parse_boolean("batch OR (scan join)")
    assert pb.tree.op == "OR"
    assert pb.tree.children[0].op == "ATOM"
    assert pb.tree.children[1].op == "AND"
    assert [a.words for a in pb.atoms] == [("batch",), ("scan",), ("join",)]


def test_parse_boolean_errors():
    for bad in ["(a OR b", "a)", "()", "a OR ()", "a gbsortby:n_chars",
                "(-a)", "-a", "(OR)", ""]:
        with pytest.raises(ValueError):
            parse_boolean(bad)


@pytest.mark.parametrize("q", [
    "fox OR (lazy river)",
    "(quick brown) OR (lazy summer)",
    '(("brown fox") OR river) quick OR bear',
    "fox (brown OR lazy) -runs",
    "(fox OR bear) site:c.com",
    'brown ("quick quick" OR bear OR river)',
    "fox -intitle:lazy (quick OR brown)",
])
def test_compile_boolean_matches_bruteforce(spark, q):
    assert _run_bool(spark, q) == _brute_bool(q), q


def test_boolean_degenerates_to_flat(spark):
    # a flat query must produce identical results through both compilers
    for q in ["quick fox", "lazy OR river", '"brown fox" -runs lang:en']:
        assert _run_bool(spark, q) == _run(spark, q)
