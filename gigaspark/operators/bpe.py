"""Byte-pair-encoding tokenizer — train + encode, Spark-first.

A real training-data pipeline needs an actual learned subword
tokenizer, not just the regex token-count upper bound in
functions/text.py.  This is the standard two-tier BPE architecture
(Sennrich et al. 2016, the public algorithm every LLM tokenizer
derives from), mapped onto Spark the way the corpus sizes demand:

  * WORD COUNTING is the 100-TB pass — a plain distributed
    groupBy(word).count() with map-side combine, uniform keys;
  * the MERGE LOOP operates on the word-frequency HISTOGRAM, which is
    vocabulary-sized (bounded, Zipf-truncated to ``max_words``), so it
    runs driver-side in pure python — identical to how production BPE
    trainers structure the work (the histogram, not the corpus, is the
    training input);
  * ENCODING broadcasts the merge ranks and applies them in an
    Arrow-batched pandas UDF with a per-batch word→tokens cache (Zipf
    again: a batch re-encodes few distinct words).

Determinism: ties in the merge loop break lexicographically, so the
same corpus always yields the same merge table on any cluster layout.
Losslessness: merges only ever join adjacent units, so concatenating a
word's tokens reproduces the word exactly (tested).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from gigaspark.functions.text import norm_text
from gigaspark.session import bounded_collect

EOW = "▁"   # end-of-word marker (sentencepiece-style block char)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the normalized corpus — the distributed pass."""
    return (
        docs.select(F.explode(F.split(norm_text(F.col(text_col)), " "))
                    .alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("n"))
    )


def train_bpe(docs: DataFrame, n_merges: int = 200,
              max_words: int = 10_000, text_col: str = "text"
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Only the Zipf-truncated word histogram (``max_words`` rows) leaves
    the cluster; the merge loop is driver-side pure python over that
    bounded table.
    """
    rows = bounded_collect(
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words), max_words, "bpe vocab")
    return merges_from_histogram({r["word"]: int(r["n"]) for r in rows},
                                 n_merges)


def merges_from_histogram(hist: dict[str, int], n_merges: int
                          ) -> list[tuple[str, str]]:
    """The merge loop over a word→count histogram (pure python — the
    histogram, not the corpus, is BPE training's real input)."""
    # word → tuple of current units (chars + EOW terminator)
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in hist.items():
        units = tuple(word) + (EOW,)
        vocab[units] = vocab.get(units, 0) + int(cnt)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for units, n in vocab.items():
            for a, b in zip(units, units[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic: max count, then lexicographic pair
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for units, n in vocab.items():
            out = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly join the lowest-rank
    adjacent pair (the canonical BPE encode loop)."""
    units = list(word) + [EOW]
    while len(units) > 1:
        best_rank, best_i = None, -1
        for i in range(len(units) - 1):
            r = ranks.get((units[i], units[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        units[best_i:best_i + 2] = [units[best_i] + units[best_i + 1]]
    return units


def _bpe_schema(doc_id_type: T.DataType) -> T.StructType:
    """Output schema keyed by the INPUT's doc_id type."""
    return T.StructType([
        T.StructField("doc_id", doc_id_type),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_bpe_tokens", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("compression", T.DoubleType()),
    ])


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    word_re: str | None = None) -> DataFrame:
    """Per-doc BPE token statistics via one Arrow-batched pass.

    The merge table is closure-captured (broadcast with the task
    binary — it is merge-count-sized, never corpus-sized); a per-batch
    word cache exploits Zipf re-use.  ``word_re``: optional word
    pattern (e.g. ``[a-z0-9]+``) instead of whitespace splitting."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = _bpe_schema(docs.schema["doc_id"].dataType)
    names = schema.fieldNames()

    def _run(batches):
        import re

        import pandas as pd

        rex = re.compile(word_re) if word_re else None
        for pdf in batches:
            cache: dict[str, int] = {}
            out = {k: [] for k in names}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                low = str(text or "").lower()
                words = rex.findall(low) if rex else low.split()
                words = [w for w in words if w]
                n_tok = 0
                n_chars = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(encode_word(w, ranks))
                    n_tok += cache[w]
                    n_chars += len(w)
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_bpe_tokens"].append(n_tok)
                out["n_chars"].append(n_chars)
                out["compression"].append(
                    round((n_chars + len(words)) / n_tok, 4) if n_tok else 0.0)
            yield pd.DataFrame(out)

    return (docs.select("doc_id", F.col(text_col).alias("text"))
            .mapInPandas(_run, schema))
