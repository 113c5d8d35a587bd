"""Query-language parser + plan compiler (SURVEY §3.2; Gigablast
``Query.cpp`` [U][H]).

Gigablast parses the user's query string into term/phrase/field nodes
(``Query::set2`` → ``QueryTerm``/``QueryWord`` arrays [U][H]): quoted
phrases, ``-`` negation, boolean OR, and field operators such as
``site:`` restriction.  The rest of the query tier (Posdb intersect,
TopTree) then consumes the parsed structure.  This module is the
Spark-first equivalent: a tiny driver-side parser (query strings are a
few bytes — parsing is not data-plane work) plus a compiler that emits
ONE declarative DataFrame plan over the shared posting lists.

Pinned grammar (documented deviation: a minimal, deterministic subset —
no wildcard, no nested parens, no UOR weights):

    query  := unit (WS unit)*          -- implicit AND between units
    unit   := atom (WS 'OR' WS atom)*  -- OR-group (left-assoc, flat)
    atom   := '-'? (phrase | field | term)
    phrase := '"' term (WS term)* '"'  -- adjacent-position match
    field  := ('site' | 'lang') ':' value
    title  := 'intitle' ':' term       -- term at pos < TITLE_LEN
    num    := ('gbmin' | 'gbmax') ':' col ':' int   -- metadata range
    sort   := 'gbsortby' ':' col       -- rank by metadata desc
    term   := bare word (lowercased; the corpus normalizer)

Pinned semantics:
  * field atoms are restrictions, never scored; ``-site:x`` negates the
    restriction.  Restrictions apply to the whole query (Query.cpp
    treats fields as required constraints [U][M]).
  * a ``-`` term/phrase at top level excludes any doc containing it.
  * every remaining unit must match (>=1 of its atoms); doc score =
    sum over all matching atoms of tf (term) / occurrence count
    (phrase); ties break doc_id asc.

Scale shape: the parsed structure is broadcast (it is the query, not
data); term scoring is one (unit_id, term)-broadcast join + one
(doc_id, unit_id) partial/final agg; each phrase is an adjacency chain
of equi-joins pre-filtered by broadcast semi-joins (bounded by the
rarest word's postings); restrictions semi-join the postings BELOW the
scoring aggs so the shuffle carries only eligible docs; the final top-k
is TakeOrderedAndProject.  No collect, no UDF, no theta join.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F

FIELD_NAMES = ("site", "lang")

# ``intitle:`` scope (Query.cpp ``title:`` field → title-hashed Posdb
# terms [U][M]): the corpus has no markup, so the title is PINNED to the
# first TITLE_LEN tokens — the same convention anchor_postings uses.
TITLE_LEN = 5


@dataclass(frozen=True)
class Atom:
    """A positive/negative query atom: kind in {'term', 'phrase'}.
    ``max_pos`` restricts matching occurrences to pos <= max_pos
    (the intitle: scope); None = anywhere in the doc."""
    kind: str
    words: tuple[str, ...]
    max_pos: int | None = None


@dataclass
class ParsedQuery:
    units: list[list[Atom]] = dc_field(default_factory=list)
    excludes: list[Atom] = dc_field(default_factory=list)
    # field name -> (include values, exclude values)
    fields: dict[str, tuple[list[str], list[str]]] = dc_field(
        default_factory=dict)
    # numeric metadata ops (Gigablast gbmin:/gbmax:/gbsortby: [U][M]):
    # (col, op, value) with op in {'min', 'max'}; sort_by = col or None
    numeric: list[tuple[str, str, int]] = dc_field(default_factory=list)
    sort_by: str | None = None

    def field_in(self, name: str) -> list[str]:
        return self.fields.get(name, ([], []))[0]

    def field_not_in(self, name: str) -> list[str]:
        return self.fields.get(name, ([], []))[1]


def _lex(q: str) -> list[str]:
    """Split into raw tokens, keeping quoted spans as single tokens
    (quote chars retained). Raises on an unterminated quote."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        neg = ""
        if c == "-" and i + 1 < n and not q[i + 1].isspace():
            neg, i, c = "-", i + 1, q[i + 1]
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in query: {q!r}")
            out.append(neg + q[i:j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace():
                j += 1
            out.append(neg + q[i:j])
            i = j
    return out


# Python twin of the corpus tokenizer's CJK-unigram rule (script
# classes \p{IsHan}… in the engines; Python has no script property, so
# the scripts' assigned blocks are PINNED here — covers every character
# a realistic query carries; exotic historic blocks are a documented
# deviation)
_CJK_RANGES = (
    (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),   # Han
    (0x20000, 0x2FA1F),                                       # Han SIP
    (0x3041, 0x3096), (0x309D, 0x309F),                       # Hiragana
    (0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF),     # Katakana
    (0xFF66, 0xFF9D),                                         # Katakana HW
    (0x1100, 0x11FF), (0x3130, 0x318F), (0xA960, 0xA97F),     # Hangul
    (0xAC00, 0xD7A3), (0xD7B0, 0xD7FF), (0xFFA0, 0xFFDC),
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _norm_tokens(w: str) -> tuple[str, ...]:
    """The corpus tokenizer (gigaspark.functions.text.
    unicode_token_string — pinned 4-rule Unicode set) applied to one
    query word, driver-side.  Query-vs-index parity REQUIRES the same
    rules on both sides: 'f(x)' must become the tokens ('f', 'x') the
    index actually contains, never the unmatchable literal 'f(x)'."""
    import unicodedata

    from gigaspark.functions.text import ENTITY_TABLE

    s = w.lower()
    for src, dst in ENTITY_TABLE:
        s = s.replace(src, dst)
    out: list[str] = []
    cur: list[str] = []
    for ch in s:
        if _is_cjk(ch):
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        elif unicodedata.category(ch)[0] in ("L", "M", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return tuple(out)


def _norm_word(w: str) -> str:
    """Single-token normalization for METADATA values (site:, lang:,
    column names) — these match table columns, not postings, so they
    lowercase without tokenizing ('site:a.com' keeps the dot)."""
    return w.lower()


def _atom_of(tok: str) -> tuple[bool, Atom | tuple[str, str]]:
    """(negated, Atom | (field, value)) for one lexed token."""
    neg = tok.startswith("-")
    if neg:
        tok = tok[1:]
    if tok.startswith('"'):
        words = tuple(t for w in tok[1:-1].split() for t in _norm_tokens(w))
        if not words:
            raise ValueError("empty phrase in query")
        return neg, Atom("phrase", words)
    head, sep, rest = tok.partition(":")
    if sep and head.lower() in FIELD_NAMES and rest:
        return neg, (head.lower(), _norm_word(rest))
    if sep and head.lower() == "intitle" and rest:
        toks_t = _norm_tokens(rest)
        if not toks_t:
            raise ValueError(f"intitle term normalizes to nothing: {rest!r}")
        if len(toks_t) > 1:
            return neg, Atom("phrase", toks_t, max_pos=TITLE_LEN - 1)
        return neg, Atom("term", toks_t, max_pos=TITLE_LEN - 1)
    if sep and head.lower() in ("gbmin", "gbmax", "gbsortby") and rest:
        if neg:
            raise ValueError(f"{head} cannot be negated")
        op = head.lower()[2:]  # min / max / sortby
        if op == "sortby":
            return False, ("_sortby", rest.lower())
        col, sep2, val = rest.partition(":")
        if not sep2 or not val.lstrip("-").isdigit():
            raise ValueError(f"{head}: expects col:int, got {rest!r}")
        return False, ("_numeric", (col.lower(), op, int(val)))
    if not tok:
        raise ValueError("empty term in query")
    toks_t = _norm_tokens(tok)
    if not toks_t:
        raise ValueError(f"term normalizes to nothing: {tok!r}")
    if len(toks_t) > 1:
        # a punctuated compound ('f(x)', 'spark-sql') indexes as its
        # constituent tokens — the query matches them as an adjacency
        # phrase, exactly how Query.cpp turns punctuation-joined words
        # into phrase terms [U][M]
        return neg, Atom("phrase", toks_t)
    return neg, Atom("term", toks_t)


def parse_query(q: str) -> ParsedQuery:
    """Parse a query string into units / excludes / field restrictions.

    Raises ValueError for an empty query, a query with no positive
    scoring atom (Gigablast likewise refuses pure-negative queries
    [U][M]), an unterminated quote, or a dangling OR.
    """
    toks = _lex(q)
    pq = ParsedQuery()
    cur: list[Atom] = []
    expect_or_operand = False
    for tok in toks:
        if tok == "OR":
            if not cur:
                raise ValueError("OR with no left operand")
            expect_or_operand = True
            continue
        neg, node = _atom_of(tok)
        if isinstance(node, tuple):  # field / numeric / sort operator
            if expect_or_operand:
                raise ValueError("field operator cannot be an OR operand")
            if node[0] == "_sortby":
                pq.sort_by = node[1]
            elif node[0] == "_numeric":
                pq.numeric.append(node[1])
            else:
                name, value = node
                inc, exc = pq.fields.setdefault(name, ([], []))
                (exc if neg else inc).append(value)
            continue
        if neg:
            if expect_or_operand:
                raise ValueError("negated atom cannot be an OR operand")
            pq.excludes.append(node)
            continue
        if expect_or_operand:
            cur.append(node)
            expect_or_operand = False
        else:
            if cur:
                pq.units.append(cur)
            cur = [node]
    if expect_or_operand:
        raise ValueError("dangling OR at end of query")
    if cur:
        pq.units.append(cur)
    if not pq.units:
        raise ValueError("query has no positive term or phrase")
    return pq


def _phrase_occurrences(postings: DataFrame, words: tuple[str, ...],
                        spark) -> DataFrame:
    """(doc_id, n) occurrence counts of the adjacent-word phrase.

    Chain of n-1 equi-joins on (doc_id, pos+i); every side is first cut
    to one word's postings via a broadcast 1-row filter, so join input
    is bounded by that word's df — the Posdb position-delta walk
    (``PosdbTable`` phrase scoring [U][M]) as Catalyst joins.
    """
    first = postings.where(F.col("term") == words[0]) \
        .select("doc_id", F.col("pos").alias("p0"))
    acc = first
    for i, w in enumerate(words[1:], start=1):
        nxt = postings.where(F.col("term") == w).select(
            "doc_id", (F.col("pos") - i).alias("p0"))
        acc = acc.join(nxt, ["doc_id", "p0"])
    return acc.groupBy("doc_id").agg(F.count("*").alias("n"))


def _restrict_docs(docs_dim: DataFrame, pq: ParsedQuery) -> DataFrame | None:
    """doc_id allowlist from the field + numeric restrictions, or None
    if the query has none (docs_dim: doc_id, site, lang, + metadata)."""
    cond = None
    for name in FIELD_NAMES:
        inc, exc = pq.field_in(name), pq.field_not_in(name)
        if inc:
            c = F.col(name).isin(inc)
            cond = c if cond is None else (cond & c)
        if exc:
            c = ~F.col(name).isin(exc)
            cond = c if cond is None else (cond & c)
    for col, op, val in pq.numeric:
        if col not in docs_dim.columns:
            raise ValueError(f"gb{op}: unknown numeric field {col!r}")
        c = (F.col(col) >= val) if op == "min" else (F.col(col) <= val)
        cond = c if cond is None else (cond & c)
    if cond is None:
        return None
    return docs_dim.where(cond).select("doc_id")


# ------------------------------------------------------------------ #
# Nested boolean queries (Query.cpp parens/boolean operators [U][M]) #
# ------------------------------------------------------------------ #

@dataclass(frozen=True)
class BoolNode:
    """op in {'AND', 'OR'} with children, or op == 'ATOM' with
    ``atom_id`` referencing the atoms list."""
    op: str
    children: tuple = ()
    atom_id: int = -1


@dataclass
class ParsedBoolean:
    tree: BoolNode = None
    atoms: list[Atom] = dc_field(default_factory=list)
    excludes: list[Atom] = dc_field(default_factory=list)
    fields: dict[str, tuple[list[str], list[str]]] = dc_field(
        default_factory=dict)

    def field_in(self, name):
        return self.fields.get(name, ([], []))[0]

    def field_not_in(self, name):
        return self.fields.get(name, ([], []))[1]


def parse_boolean(q: str) -> ParsedBoolean:
    """Recursive-descent parser for nested boolean queries:

        expr   := and_expr ('OR' and_expr)*
        and_expr := factor+                  -- implicit AND
        factor := '-'? atom | '(' expr ')'

    Negation applies to atoms only (a negated group is a pinned
    ValueError — Gigablast likewise rejects most NOT-of-group shapes);
    ``-atom`` and ``site:``/``lang:`` operators apply GLOBALLY wherever
    they appear (they are restrictions, not tree leaves); numeric and
    sort operators are rejected.  Pinned semantics: admission = the
    boolean tree over per-atom matched flags; score = Σ occurrence
    scores over ALL matched atoms.
    """
    padded, inq = [], False
    for ch in q:
        if ch == '"':
            inq = not inq
            padded.append(ch)
        elif ch in "()" and not inq:
            padded.append(f" {ch} ")
        else:
            padded.append(ch)
    toks = _lex("".join(padded))
    pb = ParsedBoolean()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_expr() -> BoolNode:
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else BoolNode(
            "OR", tuple(parts))

    def parse_and() -> BoolNode:
        factors = []
        while peek() not in (None, "OR", ")"):
            f = parse_factor()
            if f is not None:
                factors.append(f)
        if not factors:
            raise ValueError("empty boolean group")
        return factors[0] if len(factors) == 1 else BoolNode(
            "AND", tuple(factors))

    def parse_factor() -> BoolNode | None:
        """None = a global construct (field / -atom) was consumed; it
        contributes a restriction, not a tree leaf."""
        t = take()
        if t == "(":
            node = parse_expr()
            if peek() != ")":
                raise ValueError("unbalanced parenthesis")
            take()
            return node
        if t == ")":
            raise ValueError("unbalanced parenthesis")
        neg, node = _atom_of(t)
        if isinstance(node, tuple):
            if node[0] in ("_sortby", "_numeric"):
                raise ValueError(
                    f"{node[0][1:]} is not supported in boolean queries")
            name, value = node
            inc, exc = pb.fields.setdefault(name, ([], []))
            (exc if neg else inc).append(value)
            return None
        if neg:
            pb.excludes.append(node)
            return None
        pb.atoms.append(node)
        return BoolNode("ATOM", atom_id=len(pb.atoms) - 1)

    pb.tree = parse_expr()
    if pos != len(toks):
        raise ValueError("unbalanced parenthesis")
    if not pb.atoms:
        raise ValueError("query has no positive term or phrase")
    return pb


def score_boolean(postings: DataFrame, docs_dim: DataFrame,
                  query: str | ParsedBoolean) -> DataFrame:
    """Scoring core of the nested-boolean compiler: every admitted doc
    with its score, no ordering/top-k (alert matching, facets)."""
    pb = parse_boolean(query) if isinstance(query, str) else query
    spark = postings.sparkSession

    # reuse the flat path's restriction/exclusion machinery
    shim = ParsedQuery(units=[], excludes=pb.excludes, fields=pb.fields)
    allow = _restrict_docs(docs_dim, shim)
    scoped = postings if allow is None else \
        postings.join(F.broadcast(allow), "doc_id", "semi")

    term_rows = [(i, a.words[0], -1 if a.max_pos is None else a.max_pos)
                 for i, a in enumerate(pb.atoms) if a.kind == "term"]
    branches: list[DataFrame] = []
    if term_rows:
        qdf = spark.createDataFrame(
            term_rows, "atom_id INT, term STRING, cap INT")
        branches.append(
            scoped.join(F.broadcast(qdf), "term")
            .where((F.col("cap") < 0) | (F.col("pos") <= F.col("cap")))
            .groupBy("doc_id", "atom_id")
            .agg(F.count("*").alias("s")))
    for i, a in enumerate(pb.atoms):
        if a.kind == "phrase":
            occ = _phrase_occurrences(scoped, a.words, spark)
            branches.append(occ.select(
                "doc_id", F.lit(i).alias("atom_id"), F.col("n").alias("s")))
    hits = branches[0]
    for b in branches[1:]:
        hits = hits.unionByName(b)

    flags = (hits.groupBy("doc_id", "atom_id").agg(F.sum("s").alias("s"))
             .groupBy("doc_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("atom_id", "s"))).alias("m"),
                 F.sum("s").alias("score")))

    def admit(node: BoolNode):
        if node.op == "ATOM":
            return F.element_at(F.col("m"), F.lit(node.atom_id)).isNotNull()
        parts = [admit(c) for c in node.children]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if node.op == "AND" else (out | p)
        return out

    per_doc = flags.where(admit(pb.tree)).select(
        "doc_id", F.col("score").cast("long").alias("score"))

    ban = None
    for a in pb.excludes:
        if a.kind == "term":
            cond = F.col("term") == a.words[0]
            if a.max_pos is not None:
                cond = cond & (F.col("pos") <= a.max_pos)
            b = postings.where(cond).select("doc_id")
        else:
            b = _phrase_occurrences(postings, a.words, spark) \
                .select("doc_id")
        ban = b if ban is None else ban.unionByName(b)
    if ban is not None:
        per_doc = per_doc.join(ban.distinct(), "doc_id", "left_anti")
    return per_doc


def compile_boolean(postings: DataFrame, docs_dim: DataFrame,
                    query: str | ParsedBoolean, k: int = 10) -> DataFrame:
    """Nested-boolean retrieval: one plan computing per-atom match
    scores, evaluating the tree as a Column expression over per-doc
    matched flags, scoring by the sum over all matched atoms."""
    per_doc = score_boolean(postings, docs_dim, query)
    return (per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def score_query(postings: DataFrame, docs_dim: DataFrame,
                query: str | ParsedQuery) -> DataFrame:
    """The scoring core of the compiled query: every matching doc with
    its score — restrictions, unit matching, and exclusions applied,
    but NO ordering or top-k (so it also serves unbounded consumers:
    streaming alert matching, facet counting over the match set)."""
    pq = parse_query(query) if isinstance(query, str) else query
    spark = postings.sparkSession

    allow = _restrict_docs(docs_dim, pq)
    scoped = postings if allow is None else \
        postings.join(F.broadcast(allow), "doc_id", "semi")

    # --- term atoms: one broadcast (unit_id, term, cap) join + one agg
    # (cap carries the intitle: position bound; -1 = unbounded) --------
    term_rows = [(uid, a.words[0],
                  -1 if a.max_pos is None else a.max_pos)
                 for uid, unit in enumerate(pq.units)
                 for a in unit if a.kind == "term"]
    branches: list[DataFrame] = []
    if term_rows:
        qdf = spark.createDataFrame(
            term_rows, "unit_id INT, term STRING, cap INT")
        branches.append(
            scoped.join(F.broadcast(qdf), "term")
            .where((F.col("cap") < 0) | (F.col("pos") <= F.col("cap")))
            .groupBy("doc_id", "unit_id")
            .agg(F.count("*").alias("s")))

    # --- phrase atoms: one adjacency chain each (few per query) ------
    for uid, unit in enumerate(pq.units):
        for a in unit:
            if a.kind == "phrase":
                occ = _phrase_occurrences(scoped, a.words, spark)
                branches.append(occ.select(
                    "doc_id", F.lit(uid).alias("unit_id"),
                    F.col("n").alias("s")))

    hits = branches[0]
    for b in branches[1:]:
        hits = hits.unionByName(b)

    n_units = len(pq.units)
    per_doc = (
        hits.groupBy("doc_id", "unit_id").agg(F.sum("s").alias("s"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("nu"), F.sum("s").alias("score"))
        .where(F.col("nu") == F.lit(n_units))
    )

    # --- excludes: distinct doc sets, one anti-join -------------------
    ban: DataFrame | None = None
    for a in pq.excludes:
        if a.kind == "term":
            cond = F.col("term") == a.words[0]
            if a.max_pos is not None:
                cond = cond & (F.col("pos") <= a.max_pos)
            b = postings.where(cond).select("doc_id")
        else:
            b = _phrase_occurrences(postings, a.words, spark) \
                .select("doc_id")
        ban = b if ban is None else ban.unionByName(b)
    if ban is not None:
        per_doc = per_doc.join(ban.distinct(), "doc_id", "left_anti")
    return per_doc.select("doc_id", F.col("score").cast("long")
                          .alias("score"))


def compile_query(postings: DataFrame, docs_dim: DataFrame,
                  query: str | ParsedQuery, k: int = 10) -> DataFrame:
    """Compile a query string into one retrieval DataFrame
    ``(doc_id, score)`` top-k plan over ``postings(term, doc_id, pos)``
    and ``docs_dim(doc_id, site, lang, metadata...)``."""
    pq = parse_query(query) if isinstance(query, str) else query
    per_doc = score_query(postings, docs_dim, pq)

    if pq.sort_by is not None:
        # gbsortby: rank by the metadata field (desc, pinned), not the
        # text score — Gigablast's sort-override [U][M]; the field
        # rides a doc_id join from the dim, top-k stays bounded
        col = pq.sort_by
        if col not in docs_dim.columns:
            raise ValueError(f"gbsortby: unknown field {col!r}")
        return (
            per_doc.join(docs_dim.select("doc_id", col), "doc_id")
            .orderBy(F.col(col).desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id", F.col("score").cast("long").alias("score"),
                    F.col(col).cast("long").alias(col))
        )

    return (
        per_doc
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.col("score").cast("long").alias("score"))
    )
