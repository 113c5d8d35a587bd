"""Deterministic stratified sampling for training-data mixes
(beyond-reference training-pipeline mandate; no Gigablast analogue).

Mix curation ("x% of language L / source S") must be reproducible and
cluster-order-independent, so membership is a pure function of the row
key: keep a doc iff ``md5_int(salt:doc_id) % 1000 < permille(stratum)``.
No RNG state, no `rand()` (non-deterministic across retries/stages), no
driver coordination — an executor can decide membership locally, which
is what makes the operator embarrassingly parallel at 100 TB.

The per-stratum rate table is a handful of rows → broadcast hash join;
the corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gigaspark.functions.text import langid, md5_int


def sample_hash_col(key: Column, salt: str = "samp") -> Column:
    """Uniform [0,1000) bucket from the row key — portable to any
    md5-capable engine (DuckDB mirror:
    ``('0x' || substr(md5('samp:' || key::VARCHAR), 1, 8))::BIGINT % 1000``).
    """
    return md5_int(F.concat(F.lit(salt + ":"), key.cast("string"))) % 1000


def stratified_sample(docs: DataFrame, rates: DataFrame,
                      salt: str = "samp") -> DataFrame:
    """Keep each doc with probability permille/1000 within its language
    stratum.  ``rates``: (stratum string, permille int) — broadcast.

    Output: (doc_id, stratum) of the kept docs.
    """
    d = docs.select("doc_id", langid(F.col("text")).alias("stratum"))
    keep = sample_hash_col(F.col("doc_id"), salt) < F.col("permille")
    return (d.join(F.broadcast(rates), "stratum")
            .where(keep)
            .select("doc_id", "stratum"))


def repeat_weighted(docs: DataFrame, weights: DataFrame,
                    salt: str = "rep") -> DataFrame:
    """Deterministic fractional oversampling for mix weighting ("epoch
    math": see a weight-2.25 stratum 2-3 times per epoch).  ``weights``:
    (stratum string, w_permille int) — e.g. 2250 = x2.25.  Each doc
    repeats ``w//1000`` times plus one more iff its hash bucket falls
    under ``w % 1000`` — integer arithmetic end to end, membership and
    copy count a pure function of the key, so the emitted multiset is
    reproducible at any parallelism and the expected stratum mass is
    exactly w/1000.

    Scale: broadcast weight table, per-row explode — no shuffle on the
    corpus.  Output: (doc_id, stratum, copy_idx) with copy_idx in
    [0, reps).
    """
    d = docs.select("doc_id", langid(F.col("text")).alias("stratum"))
    j = d.join(F.broadcast(weights), "stratum")
    extra = (sample_hash_col(F.col("doc_id"), salt)
             < F.col("w_permille") % 1000).cast("int")
    reps = (F.floor(F.col("w_permille") / 1000) + extra).cast("int")
    return (j.withColumn("_reps", reps)
            .where(F.col("_reps") > 0)
            .select("doc_id", "stratum",
                    F.explode(F.sequence(F.lit(0), F.col("_reps") - 1))
                    .alias("copy_idx")))
