"""Streaming image-ingest → filter → shard-pack writer (the image
payload's ST-tier composition: Structured Streaming micro-batches of
image+caption rows flow through the LAION-shape corpus filter and land
on the webdataset byte stream continuously).

Shape: ``readStream`` of (image_id, w, h, caption, phash) metadata →
``foreachBatch`` — each micro-batch applies
:func:`gigaspark.operators.image_pipeline.image_corpus_filter`, lays
its KEPT samples on the global byte stream in (batch_id, image_id)
order, and appends the shard assignment rows.  The carried byte
watermark (total stream length before this batch) lives in a tiny
ledger parquet keyed by batch_id.

Exactly-once assignment under foreachBatch's at-least-once contract:

  * a batch whose id is already in the ledger is SKIPPED outright;
  * the watermark is the sum of STRICTLY EARLIER batches' byte totals
    (micro-batch ids are monotone), so a replay that does run computes
    byte-identical offsets;
  * the ledger row is written LAST (the commit point) — a crash between
    the assignment append and the ledger append leaves duplicate
    identical rows, which read-time ``distinct()`` removes exactly
    (same contract as :class:`StreamingIndex.live_postings`).

Scale shape: per-batch work is O(batch) (the within-batch prefix sum is
the same two-level ``with_global_cumsum``); the ledger is O(#batches)
rows and the watermark one agg over it; no job ever rescans the
assignment table.  The pinned global order is (batch_id, image_id) —
arrival order across batches, image_id within — so with id-ordered
input the result is bit-equal to the batch ``image_shard_pack`` of the
union (asserted in tests/test_shard_stream.py).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from gigaspark.operators.image_pipeline import (image_corpus_filter,
                                                image_shard_pack)

_ASSIGN_SCHEMA = ("image_id string, nbytes long, start_off long, "
                  "shard_id long, offset_in_shard long, batch_id long")
_LEDGER_SCHEMA = "batch_id long, n_samples long, total_bytes long"


def _meta_nbytes() -> Column:
    """Pinned sample-size estimate from metadata (w*h*3 + header) — the
    blobs are never read to plan shards."""
    return F.col("w").cast("long") * F.col("h").cast("long") * 3 + 64


class StreamingShardPacker:
    """Continuous filter + shard-pack over an image metadata stream."""

    def __init__(self, spark: SparkSession, root: str,
                 shard_bytes: int = 1 << 18,
                 caption_model: DataFrame | None = None,
                 caption_contexts: DataFrame | None = None,
                 max_mean_nll10k: int = 17500, **filter_kwargs):
        """``caption_model``/``caption_contexts``: an OFFLINE-trained
        char-bigram LM (`gigaspark.operators.lmfilter.
        train_char_bigram_lm`) applied to every micro-batch's captions —
        the standard train-offline / score-online pattern.  The model
        tables are ≤ 37² rows, broadcast per batch; when omitted the
        packer runs the metadata filter only."""
        self.spark = spark
        self.root = root
        self.shard_bytes = shard_bytes
        self.filter_kwargs = filter_kwargs
        self.caption_model = caption_model
        self.caption_contexts = caption_contexts
        self.max_mean_nll10k = max_mean_nll10k
        self.assign_dir = os.path.join(root, "assignments")
        self.ledger_dir = os.path.join(root, "ledger")

    # -- ledger ----------------------------------------------------------
    def _ledger(self) -> DataFrame:
        if not os.path.isdir(self.ledger_dir):
            return self.spark.createDataFrame([], _LEDGER_SCHEMA)
        return self.spark.read.schema(_LEDGER_SCHEMA).parquet(self.ledger_dir)

    def _carry_before(self, batch_id: int) -> tuple[bool, int]:
        """(already_committed, watermark): one agg over the tiny ledger."""
        row = (self._ledger()
               .agg(F.max(F.col("batch_id") == batch_id).alias("seen"),
                    F.sum(F.when(F.col("batch_id") < batch_id,
                                 F.col("total_bytes"))).alias("carry"))
               .collect()[0])
        return bool(row["seen"]), int(row["carry"] or 0)

    # -- write path (runs inside foreachBatch) ----------------------------
    def absorb_batch(self, batch: DataFrame, batch_id: int) -> None:
        seen, carry = self._carry_before(batch_id)
        if seen:  # replay of a committed batch: exactly-once, skip
            return
        kept = (image_corpus_filter(batch, **self.filter_kwargs)
                .where(F.col("keep")))
        if self.caption_model is not None:
            from gigaspark.operators.lmfilter import caption_ppl_gate
            gate = caption_ppl_gate(
                batch, train_docs=None, _model=self.caption_model,
                _contexts=self.caption_contexts,
                max_mean_nll10k=self.max_mean_nll10k) \
                .select("image_id", "cap_ok")
            kept = kept.join(gate, "image_id").where(F.col("cap_ok")) \
                       .drop("cap_ok")
        local = image_shard_pack(kept, shard_bytes=self.shard_bytes,
                                 nbytes=_meta_nbytes())
        goff = F.col("start_off") + F.lit(carry)
        shard = F.floor(goff / self.shard_bytes).cast("long")
        assigned = local.select(
            "image_id", "nbytes", goff.alias("start_off"),
            shard.alias("shard_id"),
            (goff - shard * self.shard_bytes).alias("offset_in_shard"),
            F.lit(batch_id).cast("long").alias("batch_id"))
        assigned.write.mode("append").parquet(self.assign_dir)
        # commit point: totals enter the ledger only after the rows land
        total = assigned.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("nbytes"), F.lit(0)).alias("b")).collect()[0]
        self.spark.createDataFrame(
            [(batch_id, int(total["n"]), int(total["b"]))],
            _LEDGER_SCHEMA).write.mode("append").parquet(self.ledger_dir)

    def sink(self):
        """foreachBatch callable for ``writeStream``."""
        return self.absorb_batch

    # -- read path ---------------------------------------------------------
    def assignments(self) -> DataFrame:
        """All shard assignments; distinct() removes the identical rows a
        crash in the parts→ledger commit window can duplicate."""
        if not os.path.isdir(self.assign_dir):
            return self.spark.createDataFrame([], _ASSIGN_SCHEMA)
        return (self.spark.read.schema(_ASSIGN_SCHEMA)
                .parquet(self.assign_dir).distinct())
