"""Scalable global dense sequence numbers (SURVEY W1 emit ordering).

``row_number() OVER (ORDER BY ...)`` with no partition key collapses the
whole dataset into ONE task — fine at 10^4 rows, fatal at 10^10.  The
Spark-idiomatic equivalent is:

  1. range-repartition + sort on the total-order key (what a global
     ``orderBy`` compiles to anyway — parallel TeraSort shape);
  2. count rows per physical partition (one lightweight agg);
  3. broadcast the running offsets and add the within-partition index.

The assigned seq values are independent of the (sampled) range
boundaries because the order key is a TOTAL order — only which task
computes which slice varies; output is bit-identical at any parallelism
(tests/test_frontier.py asserts equality with the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from gigaspark.session import stable_checkpoint

# single-window cutoff: below this a known row count takes one
# TakeOrdered-style window task (a ~30 MB in-memory sort) instead of
# the two-level range-sort + offset join — the two-level path costs 3
# extra jobs + a pinned materialization, pure overhead at bench sizes
# while remaining the only shape that survives 10^10 rows (the window
# collapses to one task, so the cutoff must stay far under executor
# memory; 1M rows × ~60 B ≈ 60 MB)
SMALL_THRESHOLD = 1_000_000


def _pinned_sorted(df: DataFrame, order: list[Column]) -> DataFrame:
    """Range-sort and MATERIALIZE once (localCheckpoint).

    The two-level seq/cumsum shape reads its sorted input twice — once
    for per-partition counts, once for the offset join.  Without
    pinning, those are two separate evaluations of a SAMPLED range
    exchange: whenever exchange reuse doesn't kick in (a re-executed
    plan, a second action like a parquet write, a layout change
    upstream), the two sides see DIFFERENT partition boundaries and the
    `_pid` join silently drops/duplicates rows (observed: a re-executed
    write lost 43% of rows).  Checkpointing the sorted result freezes
    one layout for both consumers — correct at any execution count, and
    the cost is one materialization of the FINAL output rows, which the
    caller is about to hand off anyway."""
    return stable_checkpoint(
        df.repartitionByRange(*order).sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id()))


def with_global_seq(df: DataFrame, order: list[Column], seq_col: str = "seq",
                    small_count: int | None = None) -> DataFrame:
    """Attach a dense 0-based ``seq_col`` following the total order.

    ``small_count``: pass a known row count to let tiny datasets take the
    cheap single-window path (still correct either way).
    """
    if small_count is not None and small_count <= SMALL_THRESHOLD:
        return df.withColumn(
            seq_col,
            (F.row_number().over(Window.orderBy(*order)) - 1).cast("long"))

    part = _pinned_sorted(df, order)
    # deterministic within-partition position (data already sorted)
    w = Window.partitionBy("_pid").orderBy(*order)
    part = part.withColumn("_pos", F.row_number().over(w) - 1)
    counts = part.groupBy("_pid").agg(F.count("*").alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)))
    return (
        part.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(seq_col, (F.col("_off") + F.col("_pos")).cast("long"))
        .drop("_pid", "_pos", "_off")
    )


def with_global_cumsum(df: DataFrame, order: list[Column], weight: str,
                       cum_col: str = "cum_before",
                       small_count: int | None = None) -> DataFrame:
    """Exclusive prefix sum of ``weight`` following the total ``order``
    (cum_col = Σ weight over all rows strictly before this one).

    Same two-level shape as :func:`with_global_seq` — a bare
    ``sum() OVER (ORDER BY ...)`` is a single-task window at scale, so
    past SMALL_THRESHOLD we range-sort, prefix-sum within partitions,
    and broadcast the per-partition subtotals as offsets.  Output is
    independent of parallelism because the order key is total.
    """
    if small_count is not None and small_count <= SMALL_THRESHOLD:
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn(
            cum_col, F.coalesce(F.sum(weight).over(w), F.lit(0)).cast("long"))

    part = _pinned_sorted(df, order)
    w = Window.partitionBy("_pid").orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    part = part.withColumn(
        "_pcum", F.coalesce(F.sum(weight).over(w), F.lit(0)))
    sums = part.groupBy("_pid").agg(F.sum(weight).alias("_n"))
    offsets = sums.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)))
    return (
        part.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(cum_col, (F.col("_off") + F.col("_pcum")).cast("long"))
        .drop("_pid", "_pcum", "_off")
    )
