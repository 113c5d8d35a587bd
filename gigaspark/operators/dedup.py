"""Document deduplication operators for training-data pipelines.

Gigablast dedups at three layers — URL identity (Spiderdb keys), content
checksum, and result-time summary similarity (``Msg40.cpp`` dedup pass
[U][M], SURVEY §2.5 W3).  These are the corpus-scale Spark-first
equivalents over ``documents(doc_id, text)``:

  * :func:`exact_dups`       — content-hash groupBy (keep min doc_id)
  * :func:`minhash_signatures` / :func:`lsh_candidate_pairs`
                             — MinHash + banded LSH near-dup
  * :func:`simhash`          — 32-bit SimHash per document
  * :func:`ngram_jaccard_pairs` — exact shingle-Jaccard verification

Scale design (100 TB corpus):
  * everything is shuffle-on-uniform-hash: shingle hashes and band
    hashes are uniform by construction, so the explode→groupBy joins
    don't skew; hot (ubiquitous) shingles can be dropped by document
    frequency before pairing (``max_df``) — the classic LSH guard;
  * signatures are fixed-width (n_perm ints) → tiny vs the corpus; the
    candidate-pair join is on (band_id, band_hash) buckets only;
  * all hashing is md5-hex→int, reproducible in any SQL engine (the
    DuckDB oracle runs the identical pipeline), no Python UDFs at all —
    pure Column expressions inside whole-stage codegen.

MinHash: sig_i(doc) = min over shingles s of (a_i·h(s)+b_i mod P), P =
2^31−1 (Mersenne), (a_i, b_i) from a fixed deterministic table — the
standard Broder construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from gigaspark.functions.text import md5_int, norm_text, shingles

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def perm_coeffs(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations.
    A fixed LCG (no RNG APIs) so any engine can regenerate them."""
    coeffs, x = [], 88172645463325252
    for _ in range(n_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (MERSENNE_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE_P
        coeffs.append((a, b))
    return coeffs


def exact_dups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized-content md5: one row per distinct
    fingerprint with the kept (min) doc_id and the duplicate count."""
    return (
        docs.withColumn("fp", F.md5(norm_text(F.col(text_col))))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_dups"))
    )


def doc_shingles(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, sh) distinct word-k-gram hash pairs — the explode stage.
    ``sh`` is uniform (md5-derived) so every downstream shuffle is even."""
    return (
        docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("s"))
        .select("doc_id", md5_int(F.col("s")).alias("sh"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, n_perm: int = 16) -> DataFrame:
    """(doc_id, i, sig): n_perm minhash values per document.

    All n_perm permutations are evaluated as parallel ``min`` aggregates
    in ONE groupBy — the shuffle moves only |shingles| rows (with map-side
    partial mins), not |shingles|×n_perm exploded rows, and the wide→long
    unpivot (``stack``) runs on the tiny post-agg result (docs×n_perm).
    """
    aggs = [
        F.min((F.lit(a) * F.col("sh") + F.lit(b)) % MERSENNE_P).alias(f"s{i}")
        for i, (a, b) in enumerate(perm_coeffs(n_perm))
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{i}, s{i}" for i in range(n_perm))
    return wide.selectExpr(
        "doc_id", f"stack({n_perm}, {stack_args}) AS (i, sig)")


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = 4) -> DataFrame:
    """Band the signatures and emit candidate pairs (a_id < b_id) that
    collide in ≥1 band.  Join key (band, band_key) is a uniform md5 →
    no skew; identical-signature clusters are the only hot buckets and
    those are true duplicates (bounded by real dup rate).
    """
    banded = (
        sigs.withColumn("band", (F.col("i") % n_bands).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.array_sort(F.collect_list(F.struct("i", "sig"))).alias("kv"))
        .select(
            "doc_id", "band",
            F.md5(F.concat_ws(",", F.transform(
                F.col("kv"), lambda s: s["sig"].cast("string")))).alias("band_key"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def ngram_jaccard_pairs(sh: DataFrame, pairs: DataFrame | None = None,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs (or all pairs
    sharing ≥1 shingle when ``pairs`` is None — only sane at small scale;
    at corpus scale always feed LSH candidates).

    Returns (a_id, b_id, jaccard) with jaccard ≥ threshold, rounded to 4
    decimals (portable float contract for the SQL oracle).
    """
    if pairs is None:
        x = sh.alias("x")
        y = sh.alias("y")
        pairs = (
            x.join(y, "sh")
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
            .distinct()
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a_id"), "sh"), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh2")), "b_id")
        .where(F.col("sh") == F.col("sh2"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc: bit j = majority vote of token-hash bit j.

    (doc_id, token-hash) → explode over bit positions → vote sum →
    re-assemble.  Two shuffles on uniform keys; integer-only arithmetic
    (portable to the SQL oracle).
    """
    toks = (
        docs.select("doc_id", F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("t"))
        .where(F.col("t") != "")
        .select("doc_id", md5_int(F.col("t")).alias("h"))
    )
    # one shuffle: per-bit votes as `bits` literal-shift agg expressions
    # (no bit-position explode — 32× fewer shuffled rows than the naive plan)
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ])
    sig = sum(
        (F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long"))
         .otherwise(F.lit(0).cast("long")) for j in range(bits)),
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", sig.alias("simhash"))


def hamming_neardup_pairs(sigs: DataFrame, id_col: str, sig_col: str,
                          bits: int = 64, n_bands: int = 8,
                          max_dist: int = 3) -> DataFrame:
    """Banded hamming-LSH near-dup pairs over ANY integer signature
    column (text SimHash, image dHash/pHash — operators/multimodal.py).

    Two signatures within ``max_dist`` hamming bits agree EXACTLY on at
    least ``n_bands - max_dist`` of ``n_bands`` disjoint bit-bands
    (pigeonhole), so with ``max_dist < n_bands`` candidate generation by
    band-equality join is LOSSLESS — this is exact near-dup search, not
    approximate, at bucket-join cost.

    Scale: the join key is (band_id, band_bits) — uniform by signature
    mixing; identical-signature clusters bound bucket size by true dup
    count.  ``bit_count(a XOR b)`` verification runs JVM-side in
    whole-stage codegen.  Output: (a_id, b_id, dist), a_id < b_id.
    """
    assert bits % n_bands == 0, "bands must tile the signature"
    w = bits // n_bands
    mask = (1 << w) - 1
    bands = sigs.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col(sig_col), i * w)
                     .bitwiseAND(F.lit(mask)).alias("key"))
            for i in range(n_bands)
        ])).alias("bk"),
    ).select("_id", "_sig", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"),
                F.col("a._sig").alias("sa"), F.col("b._sig").alias("sb"))
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.withColumn("dist", F.bit_count(
            F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"))
        .where(F.col("dist") <= max_dist)
        .select("a_id", "b_id", "dist")
    )


def connected_components(pairs: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id", max_iter: int = 50
                         ) -> DataFrame:
    """Connected components over the near-dup pair graph → (id, label)
    with label = min member id of the component.

    A dedup pipeline needs CLUSTERS, not pairs ("keep one per
    duplicate group"); this is iterative min-label propagation over
    DataFrames: each round every vertex takes the min of its own and
    its neighbors' labels, checkpointed per round (LSM-style, the same
    stable_checkpoint the crawl loop uses), until a round changes
    nothing.  Converges in O(component diameter) rounds — near-dup
    clusters are shallow (dups of a common source), so this is a
    handful of rounds even at corpus scale; the per-round work is one
    uniform-key join + groupBy.
    """
    from gigaspark.session import stable_checkpoint

    edges = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
             .unionByName(pairs.select(F.col(b_col).alias("u"),
                                       F.col(a_col).alias("v"))))
    edges = stable_checkpoint(edges)
    labels = (edges.select("u").distinct()
              .select(F.col("u").alias("id"), F.col("u").alias("label")))
    labels = stable_checkpoint(labels)
    for _ in range(max_iter):
        nbr = (edges.join(labels.withColumnRenamed("id", "v"), "v")
               .groupBy(F.col("u").alias("id"))
               .agg(F.min("label").alias("nbr_label")))
        new = (labels.join(nbr, "id", "left")
               .select("id", F.least(
                   F.col("label"),
                   F.coalesce(F.col("nbr_label"), F.col("label")))
                   .alias("label")))
        from pyspark.sql import Observation
        obs = Observation()
        joined = (new.alias("n")
                  .join(labels.alias("o"), "id")
                  .observe(obs, F.sum((F.col("n.label") != F.col("o.label"))
                                      .cast("long")).alias("changed"))
                  .select("id", F.col("n.label").alias("label")))
        labels = stable_checkpoint(joined)
        if int(obs.get["changed"] or 0) == 0:
            break
    return labels


def contamination_overlap(docs: DataFrame, eval_docs: DataFrame,
                          k: int = 3, threshold_pct: int = 10) -> DataFrame:
    """Benchmark decontamination (training-data hygiene): per training
    document, how many of its distinct word-k-gram shingles also occur
    anywhere in an evaluation set, and a contaminated flag when the hit
    share reaches ``threshold_pct`` percent (integer math — no float
    drift across engines; zero-shingle docs are never contaminated).

    Plan: both sides reduce to DISTINCT shingle hashes.  The eval side
    (benchmarks are thousands of docs vs billions of training docs)
    collapses to a distinct-hash set and BROADCASTS into a semi-join
    probe against the training shingles, so the big side never
    shuffles for the membership test; per-doc totals and hits are two
    partial-aggregated groupBys on the uniform md5 shingle space.
    """
    tr = doc_shingles(docs, k)
    ev = doc_shingles(eval_docs, k).select("sh").distinct()
    tot = tr.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hit = (tr.join(F.broadcast(ev), "sh", "semi")
           .groupBy("doc_id").agg(F.count("*").alias("n_hit")))
    return (
        docs.select("doc_id")
        .join(tot, "doc_id", "left").join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sh", F.lit(0)).cast("long").alias("n_sh"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"))
        .withColumn(
            "contaminated",
            (F.col("n_hit") > 0)
            & (F.col("n_hit") * 100 >= F.lit(threshold_pct) * F.col("n_sh")))
    )


def repetition_stats(docs: DataFrame, k: int = 2,
                     text_col: str = "text") -> DataFrame:
    """Intra-document repetition (Gopher/C4-style quality signal): total
    vs distinct word-k-grams plus the single most-repeated gram's share,
    all integer-percent (cross-engine exact).  ``repetitive`` pins the
    filter rule: ≥30% duplicate grams OR one gram ≥20% of the doc.

    Plan: one explode bounded by token count, then a two-level agg —
    per-(doc, gram) counts with map-side combine, then per-doc rollup;
    both shuffles key on doc_id(+gram), uniform by construction.
    """
    g = (docs.select("doc_id",
                     F.explode(shingles(F.col(text_col), k)).alias("s"))
         .groupBy("doc_id", "s").agg(F.count("*").alias("c")))
    agg = g.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"))
    out = (docs.select("doc_id").join(agg, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
                   F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
                   F.coalesce("top_c", F.lit(0)).cast("long").alias("top_c")))
    has = F.col("n_grams") > 0
    dup_pct = F.when(has, (100 * (F.col("n_grams") - F.col("n_distinct")))
                     .cast("long") / F.col("n_grams")).otherwise(F.lit(0))
    top_pct = F.when(has, (100 * F.col("top_c")).cast("long")
                     / F.col("n_grams")).otherwise(F.lit(0))
    return (out.withColumn("dup_pct", F.floor(dup_pct).cast("long"))
            .withColumn("top_pct", F.floor(top_pct).cast("long"))
            .withColumn("repetitive",
                        (F.col("dup_pct") >= 30) | (F.col("top_pct") >= 20)))


def substring_dup_spans(docs: DataFrame, w: int = 5,
                        text_col: str = "text") -> DataFrame:
    """Cross-document repeated spans — the exact-substring dedup signal
    (the "Deduplicating Training Data Makes Language Models Better"
    suffix-array idea, Spark-shaped: pinned fixed-width w-token windows
    instead of arbitrary-length suffixes, so the whole computation is
    two uniform hash aggs).  Per doc: distinct w-token windows, how
    many of them also occur in >=2 DISTINCT docs, integer-percent
    share (intra-doc repeats are repetition_stats' job, not this one).

    Scale: the window explode is bounded by token count; both aggs and
    the semi-join key on the uniform md5 window hash — no skew, no
    all-pairs anything.  At 100 TB the repeated-hash set is the only
    cross-doc state and it shrinks with w.
    """
    sh = doc_shingles(docs, w, text_col)              # distinct (doc_id, sh)
    rep = (sh.groupBy("sh").agg(F.count_distinct("doc_id").alias("nd"))
           .where(F.col("nd") >= 2).select("sh"))
    tot = sh.groupBy("doc_id").agg(F.count("*").alias("n_windows"))
    hit = (sh.join(rep, "sh", "semi")
           .groupBy("doc_id").agg(F.count("*").alias("n_rep")))
    out = (docs.select("doc_id")
           .join(tot, "doc_id", "left").join(hit, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("n_windows", F.lit(0)).cast("long")
                   .alias("n_windows"),
                   F.coalesce("n_rep", F.lit(0)).cast("long")
                   .alias("n_rep")))
    return out.withColumn(
        "rep_pct",
        F.when(F.col("n_windows") > 0,
               F.floor(100 * F.col("n_rep") / F.col("n_windows")))
        .otherwise(F.lit(0)).cast("long"))


def image_caption_neardup(imgs: DataFrame, id_col: str = "image_id",
                          phash_col: str = "phash",
                          caption_col: str = "caption",
                          bits: int = 60, n_bands: int = 6,
                          max_dist: int = 4) -> DataFrame:
    """Cross-modal near-dup pairs over image+caption rows (the
    north-rule input shape: image_id, ..., caption, phash): a pair is a
    duplicate iff the perceptual hashes are within ``max_dist`` hamming
    bits OR the captions are byte-equal — LAION-style pipelines dedup on
    either signal, since re-encoded images drift the phash while scraped
    captions survive verbatim, and cropped images keep the phash while
    captions get rewritten.

    Scale shape: the phash side is the LOSSLESS banded hamming-LSH
    (:func:`hamming_neardup_pairs`); the caption side is an equality
    self-join on md5(caption) — a uniform bucketed key whose bucket
    sizes are true dup-group sizes.  Neither side is all-pairs; the
    merge is a groupBy on the (a_id, b_id) pair key.

    Output: (a_id, b_id, phash_dist int, same_caption boolean),
    a_id < b_id.
    """
    sigs = imgs.select(F.col(id_col).alias("_id"),
                       F.col(phash_col).alias("_ph"),
                       F.md5(F.col(caption_col)).alias("_ck"))
    ph = hamming_neardup_pairs(
        sigs.select("_id", "_ph"), "_id", "_ph",
        bits=bits, n_bands=n_bands, max_dist=max_dist
    ).select("a_id", "b_id", "dist", F.lit(False).alias("same_caption"))
    a, b = sigs.alias("a"), sigs.alias("b")
    cap = (
        a.join(b, "_ck")
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"),
                F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph")))
                .cast("int").alias("dist"),
                F.lit(True).alias("same_caption"))
    )
    return (
        ph.unionByName(cap)
        .groupBy("a_id", "b_id")
        .agg(F.min("dist").cast("int").alias("phash_dist"),
             F.max("same_caption").alias("same_caption"))
    )


def line_dedup(docs: DataFrame, max_df: int = 5,
               domain_col: str = "domain",
               text_col: str = "text") -> DataFrame:
    """Line-level boilerplate removal (CCNet's paragraph dedup /
    RefinedWeb's line-wise corrections, public papers): drop every line
    that occurs in MORE THAN ``max_df`` distinct documents of the same
    domain (nav bars, cookie banners, copyright footers), preserving
    the remaining lines' order.  Returns
    (doc_id, clean_text, n_lines, n_removed).

    Pinned laws: lines split on ``\\n`` exactly (no trimming — byte
    drift would change the count key); the duplicate key is
    (domain, line) by md5; empty lines are lines too; a doc whose
    every line is boilerplate comes back with ``clean_text = ''``.

    Scale shape: posexplode → ONE (domain, line-md5) count agg
    (map-side combinable, uniform md5 keys) → the line-frequency dim
    joins back by the same uniform key → one doc_id agg rebuilds the
    text via sort_array (per-doc arrays, no global window).  The
    corpus shuffles twice on uniform keys and never self-joins.
    """
    lines = docs.select(
        "doc_id", F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n", -1))
        .alias("pos", "line"))
    freq = (lines.groupBy("domain", F.md5("line").alias("lh"))
            .agg(F.countDistinct("doc_id").alias("df")))
    flagged = (lines.withColumn("lh", F.md5("line"))
               .join(freq, ["domain", "lh"])
               .withColumn("removed", F.col("df") > max_df))
    return (flagged.groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("removed").cast("long")).alias("n_removed"),
                 F.array_join(
                     F.transform(
                         F.filter(
                             F.array_sort(F.collect_list(
                                 F.struct("pos", "removed", "line"))),
                             lambda x: ~x["removed"]),
                         lambda x: x["line"]), "\n").alias("clean_text"))
            .select("doc_id", "clean_text", "n_lines", "n_removed"))
