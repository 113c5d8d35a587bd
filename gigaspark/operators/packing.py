"""Sequence packing for training-data assembly (beyond-reference
training-pipeline mandate; no Gigablast analogue).

Pretraining pipelines concatenate documents in a pinned total order into
one token stream and chunk it into fixed-size context blocks
("concat-and-chunk" packing).  The operator computes, per document, the
block span it lands in: start offset, first/last block id, and how many
blocks it straddles — the metadata a sharded packing writer needs to
route each doc's tokens to block files without materializing the stream.

Scale shape: the only global state is an exclusive prefix sum of token
counts over the doc_id total order, done with the two-level
range-sort + broadcast-offsets pattern (`ordering.with_global_cumsum`)
— no single-task window, one range shuffle, O(P) driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gigaspark.functions.text import token_count
from gigaspark.operators.ordering import with_global_cumsum


def pack_blocks(docs: DataFrame, ctx: int = 512,
                small_count: int | None = None) -> DataFrame:
    """Per-doc packing span over the doc_id-ordered token stream.

    Zero-token docs are dropped (they occupy no stream positions).
    Output: (doc_id, n_tokens, start_off, first_block, last_block,
    n_blocks), all bigint.
    """
    t = (docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
         .where(F.col("n_tokens") > 0))
    c = with_global_cumsum(t, [F.col("doc_id").asc()], "n_tokens",
                           "start_off", small_count)
    end = F.col("start_off") + F.col("n_tokens") - 1
    first = F.floor(F.col("start_off") / ctx).cast("long")
    last = F.floor(end / ctx).cast("long")
    return c.select(
        "doc_id", "n_tokens", "start_off",
        first.alias("first_block"), last.alias("last_block"),
        (last - first + 1).alias("n_blocks"))
