"""Streaming crawl-trap detection: the corpus-level template-explosion
detector (`operators/url_filters.py::trap_templates`) fed by the
CONTINUOUS discovery stream — a crawler wants to stop feeding a trap
while the crawl is still running, not at the next batch job.

Shape: ``readStream`` of discovered URLs → ``foreachBatch`` appends a
per-batch (host, template, depth, n_urls, batch_id) count part —
O(batch) work, never touching old parts; reads aggregate the NARROW
parts table (templates, not URLs) and apply the same trap law.  The
batch operator and this stream share the template derivation verbatim
(one function), so stream↔batch parity is structural.

Replay safety: ``foreachBatch`` is at-least-once — a replayed batch
re-appends an IDENTICAL (batch_id, host, template, depth, n_urls) row,
so read-time ``distinct()`` before the sum makes the fold exact (same
contract as StreamingIndex.live_postings).

Scale: the parts table grows with batches × distinct templates, not
URLs; per-host template cardinality is bounded in practice and a
periodic compaction (read → re-aggregate → atomic swap) would bound it
further — omitted here because reads already aggregate in one
map-side-combinable pass.

NOTE on exactness: per-batch counts assume the upstream URL-seen
filter already dedups discoveries (the frontier guarantees this — a
URL enters the stream once); under that invariant the summed counts
EQUAL the batch operator's counts on the union.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gigaspark.operators.url_filters import (TRAP_MIN_URLS, TRAP_MAX_DEPTH,
                                             trap_templates)

_PARTS_SCHEMA = ("batch_id long, host string, template string, depth int,"
                 " n_urls long")


class StreamingTrapDetector:
    """Running (host, template) counts fed by micro-batches of URLs."""

    def __init__(self, spark: SparkSession, root: str,
                 max_depth: int = TRAP_MAX_DEPTH):
        self.spark = spark
        self.root = root
        self.max_depth = max_depth
        self.parts_dir = os.path.join(root, "template_counts")

    # -- write path (runs inside foreachBatch) -------------------------
    def absorb_batch(self, batch: DataFrame, batch_id: int) -> None:
        counts = trap_templates(batch.select("url"), min_urls=1,
                                max_depth=self.max_depth) \
            .select(F.lit(batch_id).cast("long").alias("batch_id"),
                    "host", "template", "depth", "n_urls")
        counts.write.mode("append").parquet(self.parts_dir)

    def sink(self):
        return self.absorb_batch

    # -- read path ------------------------------------------------------
    def template_counts(self) -> DataFrame:
        p = self.spark.read.schema(_PARTS_SCHEMA).parquet(self.parts_dir)
        return (p.distinct()                     # foreachBatch replay guard
                .groupBy("host", "template", "depth")
                .agg(F.sum("n_urls").alias("n_urls")))

    def current_traps(self, min_urls: int = TRAP_MIN_URLS) -> DataFrame:
        """Same verdict law as the batch operator, over the running
        counts — broadcastable back into the frontier as the
        suppression dim."""
        c = self.template_counts()
        return c.select(
            "host", "template", "depth", "n_urls",
            ((F.col("n_urls") >= min_urls)
             & F.col("template").contains("*")).alias("is_trap"))
