"""End-to-end training-corpus filter (the C4/Gopher recipe as ONE
declarative plan — the driver mandate's capstone: language-ID, quality,
repetition, benchmark decontamination, and exact dedup composed into a
keep/drop decision with a reason code per document).

This is the operation a 100 TB pre-training pipeline actually runs:
every rule is one of this repo's already-oracle-matched primitives
(:mod:`gigaspark.functions.text`, :mod:`gigaspark.operators.dedup`),
composed so the corpus is scanned a bounded number of times and every
join keys on ``doc_id`` (uniform) or a hash fingerprint (uniform):

  * lang / quality ride the FIRST scan as pure Column expressions
    (whole-stage codegen, no shuffle at all);
  * repetition is the two-level k-gram agg (doc_id-keyed);
  * contamination broadcasts the (small) eval-set shingle hashes and
    semi-join-probes the corpus shingles — the big side never shuffles
    for membership;
  * exact dedup groups on the md5 content fingerprint (uniform key) and
    keeps the min doc_id per group (canonical-winner rule).

Rule precedence is PINNED (first failing rule names the reason):
``lang`` → ``quality`` → ``repetition`` → ``contamination`` →
``duplicate`` → ``keep``.  All thresholds integer/4-decimal pinned so a
SQL oracle reproduces the decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gigaspark.functions.text import langid, norm_text, quality_score
from gigaspark.operators.dedup import contamination_overlap, repetition_stats


def corpus_filter(docs: DataFrame, eval_docs: DataFrame,
                  lang: str = "en", min_quality: float = 0.75,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, lang_ok, quality, repetitive, contaminated, duplicate,
    keep, reason) — the full filter decision per document."""
    base = docs.select(
        "doc_id",
        (langid(F.col(text_col)) == lang).alias("lang_ok"),
        quality_score(F.col(text_col)).alias("quality"),
        F.md5(norm_text(F.col(text_col))).alias("fp"))

    rep = repetition_stats(docs, k=2, text_col=text_col) \
        .select("doc_id", "repetitive")
    con = contamination_overlap(docs, eval_docs, k=3, threshold_pct=10) \
        .select("doc_id", "contaminated")

    # canonical-winner exact dedup: min doc_id per content fingerprint
    canon = base.groupBy("fp").agg(F.min("doc_id").alias("canon_id"))
    dup = (base.join(canon, "fp")
           .select("doc_id", (F.col("doc_id") != F.col("canon_id"))
                   .alias("duplicate")))

    j = (base.drop("fp")
         .join(rep, "doc_id")
         .join(con, "doc_id")
         .join(dup, "doc_id"))

    reason = (
        F.when(~F.col("lang_ok"), F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("repetitive"), F.lit("repetition"))
        .when(F.col("contaminated"), F.lit("contamination"))
        .when(F.col("duplicate"), F.lit("duplicate"))
        .otherwise(F.lit("keep")))
    return (j.withColumn("reason", reason)
            .withColumn("keep", F.col("reason") == "keep")
            .select("doc_id", "lang_ok", "quality", "repetitive",
                    "contaminated", "duplicate", "keep", "reason"))
