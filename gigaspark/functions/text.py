"""Text-analysis functions for training-data pipelines (driver mandate:
language-ID, quality scoring, token counting, document fingerprinting).

Gigablast's query-tier text machinery (``Words.cpp``/``Lang.cpp``/
``Unicode.cpp`` [U][H], SURVEY §2.8 C5) tokenizes and language-tags every
document at index time; these are the Spark-first equivalents over a
``documents(doc_id, text, ...)`` table, built for the 100 TB case:

  * every function is a pure Column expression (JVM-side, whole-stage
    codegen, no Python) — the hot path never leaves Tungsten;
  * hashing uses md5-hex→int so a DuckDB oracle can reproduce values
    bit-for-bit (``conv(substr(md5(x),1,8),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(x),1,8))::bigint``) — xxhash64 is Spark-only;
  * n-gram / shingle explosion is bounded by token count, and the
    downstream joins key on the uniform shingle hash — no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# language marker words — the length/replace trick is portable to any SQL
# engine (no regex dialect drift); counts of ' word ' occurrences
LANG_MARKERS = {
    "en": ["the", "and", "with"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "los"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def norm_text(c: Column) -> Column:
    """lowercase + collapse runs of whitespace + trim — the canonical text
    form every downstream hash/shingle uses."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# --------------------------------------------------------------------- #
# Pinned Unicode tokenization rule set (SURVEY C5 — Unicode.cpp/         #
# Entities.cpp [U][H] parity layer).  Both engines (Spark/Java regex,   #
# DuckDB/RE2) implement the IDENTICAL four rules so oracles stay        #
# bit-exact on any corpus, Latin or not:                                #
#   1. HTML entities decode via a pinned table, &amp; LAST (replace     #
#      chaining with amp last ≡ a single-pass decoder for this table);  #
#   2. Unicode lowercase (engine default toLowerCase — pinned: no NFC); #
#   3. every CJK codepoint (Han/Hiragana/Katakana/Hangul scripts) is    #
#      its own token — unigram indexing, the pinned stand-in for        #
#      dictionary word segmentation;                                    #
#   4. token characters are letters/marks/digits (\p{L}\p{M}\p{N});    #
#      every other codepoint separates tokens.                          #
# --------------------------------------------------------------------- #

# decode order is load-bearing: &amp; LAST makes "&amp;lt;" → "&lt;"
# (the literal), exactly what a one-pass entity decoder produces
ENTITY_TABLE = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]

# Java regex script classes (Spark side); DuckDB/RE2 spells these
# \p{Han} etc. — see the SQL mirror in __spark_entry__._POSTINGS_CTE
_CJK_JAVA = r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}]"


def decode_entities(c: Column) -> Column:
    """Pinned-table HTML entity decode (rule 1)."""
    for src, dst in ENTITY_TABLE:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def unicode_token_string(c: Column) -> Column:
    """Rules 1-4 applied: single-space-separated Unicode tokens.
    Split on ' ' (dropping empties) to get the token stream."""
    e = decode_entities(F.lower(c))
    e = F.regexp_replace(e, f"({_CJK_JAVA})", " $1 ")
    e = F.regexp_replace(e, r"[^\p{L}\p{M}\p{N}]+", " ")
    return F.trim(e)


def token_count(c: Column) -> Column:
    """Whitespace token count of the normalized text."""
    n = norm_text(c)
    return F.when(n == "", F.lit(0)).otherwise(F.size(F.split(n, " "))).cast("long")


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and each
    punctuation char count as one token (a BPE-style upper bound)."""
    n = norm_text(c)
    stripped = F.regexp_replace(n, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]", "x")
    return F.when(n == "", F.lit(0)).otherwise(
        F.length(F.regexp_replace(stripped, " ", ""))).cast("long")


def _count_occurrences(c: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via the portable length/replace trick."""
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def word_occurrences(c: Column, word: str) -> Column:
    """Count of a whole word in normalized text (padded-space matching)."""
    padded = F.concat(F.lit(" "), norm_text(c), F.lit(" "))
    return _count_occurrences(padded, f" {word} ")


def stopword_ratio(c: Column) -> Column:
    hits: Column = F.lit(0).cast("long")
    for w in STOPWORDS:
        hits = hits + word_occurrences(c, w)
    return F.round(hits / F.greatest(token_count(c), F.lit(1)), 4)


def punct_ratio(c: Column) -> Column:
    n = norm_text(c)
    punct = F.length(n) - F.length(F.regexp_replace(n, r"[^A-Za-z0-9\s]", ""))
    return F.round(punct / F.greatest(F.length(n), F.lit(1)), 4)


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane mean token
    length, some stopwords, low punctuation. Deterministic, SQL-portable."""
    toks = token_count(c)
    mean_len = F.length(norm_text(c)) / F.greatest(toks, F.lit(1))
    s = (
        F.when(toks >= 10, 0.25).otherwise(0.0)
        + F.when((mean_len >= 3) & (mean_len <= 12), 0.25).otherwise(0.0)
        + F.when(stopword_ratio(c) >= 0.05, 0.25).otherwise(0.0)
        + F.when(punct_ratio(c) <= 0.2, 0.25).otherwise(0.0)
    )
    return F.round(s, 2)


def langid(c: Column) -> Column:
    """N-gram-free heuristic language ID: argmax of marker-word hit counts;
    ties and zero-hit rows → 'und'. First-match when-chain = deterministic."""
    scores = {
        lang: sum((word_occurrences(c, w) for w in words), F.lit(0).cast("long"))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = tie-break precedence (pinned)
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def md5_int(c: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 as a bigint.
    DuckDB mirror: ``('0x' || substr(md5(x), 1, 8))::bigint``."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def content_fingerprint(c: Column) -> Column:
    """Whole-document fingerprint = md5 of normalized text (C9 analogue)."""
    return F.md5(norm_text(c))


def shingles(c: Column, k: int = 3) -> Column:
    """Array of word k-gram strings from normalized text (length n-k+1).

    Built as k-1 ``zip_with`` folds over shifted slices of the token
    array — NOT a ``transform`` whose lambda re-reads the outer array:
    a non-lambda expression inside a higher-order-function body is
    re-evaluated PER ELEMENT, so the obvious
    ``transform(seq, i -> concat(element_at(toks, i)...))`` re-runs the
    whole ``split()`` k times for every window (O(tokens²·k) per doc —
    measured 24 s for one count over 5 000 docs).  ``zip_with``
    evaluates its two array arguments once per ROW, so this shape does
    k split evaluations per document total (same count: 1.5 s).
    """
    toks = F.split(norm_text(c), " ")
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        nxt = F.slice(toks, j + 1, m)
        acc = F.zip_with(acc, nxt,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(acc)


# --- PII scrubbing (training-data hygiene) --------------------------------- #
# Pinned patterns, parity-tested Java-regex ≡ DuckDB-RE2 (same counts and
# replacements on adversarial samples): emails, dotted-quad IPv4, and
# NNN[-. ]NNN[-. ]NNNN phone shapes.  Redaction order is fixed
# (email → ipv4 → phone) so both engines compose identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_counts(c: Column) -> tuple[Column, Column, Column]:
    """(n_email, n_ipv4, n_phone) occurrence counts — pure Column exprs
    (JVM regex, codegen); counts are taken on the RAW text, before any
    redaction, so categories don't shadow each other."""
    return (F.regexp_count(c, F.lit(PII_EMAIL)).cast("long"),
            F.regexp_count(c, F.lit(PII_IPV4)).cast("long"),
            F.regexp_count(c, F.lit(PII_PHONE)).cast("long"))


def redact_pii(c: Column) -> Column:
    """Replace every PII span with a typed token (<EMAIL>/<IPV4>/<PHONE>),
    applied in the pinned order email → ipv4 → phone."""
    out = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IPV4>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")
