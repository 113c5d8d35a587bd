"""Megahost-skew hardening: the two-level tournament (SURVEY §4.4).

Gigablast sidesteps hot-domain skew physically — one IP lives on one
shard and ``maxSpidersPerIp`` throttles it (``Spider.cpp`` [U][M]) — but
a shard owning a megahost still hotspots.  At 10^10-URL scale a single
host can hold 10^8 pending URLs; a plain
``row_number() over (partition by firstip)`` would funnel them through
one task.

The tournament splits each host into S salt sub-partitions
(salt = pmod(urlhash48, S) — uniform by construction), takes the top-k
of each sub-partition, and only then runs the exact original window on
the ≤ S·k survivors per host.  The final result is IDENTICAL to the
direct window (each sub-partition's top-k is a superset of its members
in the host's true top-k) while every task handles at most
max(|host|/S, S·k) rows.  AQE skew-join splitting stays on as backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def tournament_prune(df: DataFrame, key_cols: list[str], order: list[Column],
                     k_max: int, salt_key: str = "urlhash48",
                     n_salts: int = 16) -> DataFrame:
    """Stage 1: keep each (key, salt) sub-partition's top-``k_max`` rows.

    Guarantees: for any k ≤ k_max, the true per-key top-k by ``order``
    all survive.  Output partition sizes are bounded by S·k_max per key
    regardless of key skew.
    """
    salt = F.pmod(F.col(salt_key), F.lit(n_salts))
    w = Window.partitionBy(*key_cols, salt).orderBy(*order)
    return (
        df.withColumn("_trn", F.row_number().over(w))
        .where(F.col("_trn") <= k_max)
        .drop("_trn")
    )


def topk_per_key(df: DataFrame, key_cols: list[str], order: list[Column],
                 k: int, salt_key: str, n_salts: int = 16,
                 rank_col: str = "rn") -> DataFrame:
    """Skew-proof per-key top-k: tournament prune, then the exact window.

    Equivalent to ``row_number() over (partition by key order by order)
    <= k`` — verified property-style in tests/test_skew.py.
    """
    pruned = tournament_prune(df, key_cols, order, k, salt_key, n_salts)
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
