"""CCNet-style LM-perplexity quality filter (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data") — the missing flagship of the LLM-data-pipeline tier: train a
small character-level bigram LM on a clean in-corpus slice, score every
document's negative log-likelihood, and bucket the corpus into
``head`` / ``middle`` / ``tail`` by sample-derived perplexity cutoffs.

Reference parity note: Gigablast has no LM filter; this operator is part
of the driver-mandated training-data-pipeline surface (SURVEY §2-LLM),
spec'd from the public CCNet paper, not from ``/root/reference`` (empty
checkout, citations stay [U] per SURVEY §0).

Cross-engine float discipline (the repo's bm25 rule, hardened further):
each bigram log-probability is pinned as an INTEGER in tenth-milli-nats
(``CAST(round(ln(p) * 10000, 0) AS BIGINT)``), so the per-document score
is an EXACT integer sum — no float-accumulation-order hazard at all.
The only doubles that exist are (a) the one ``ln`` per *distinct* bigram
(≤ 37² = 1369 of them; both engines agree after the e-4 quantisation)
and (b) the final ``nll10k / n_bigrams`` mean used for bucket
comparison, a single IEEE division of exact integers — bit-identical in
Spark and DuckDB.

Scale shape (100 TB story):

* **Training** is one distributed histogram: explode the training slice
  into character bigrams, ``groupBy(bigram).count()`` (map-side combine,
  uniform keys, one shuffle).  The model is ≤ 37×37 rows → broadcast.
* **Scoring** is explode → broadcast-join the model → one ``doc_id``
  aggregation.  The corpus shuffles once, on a uniform key.
* **Cutoffs** follow CCNet's own practice: percentiles are computed ONCE
  on a deterministic hash-sample (``doc_id % sample_mod == 3``), then
  applied to the full corpus as broadcast constants.  The full corpus is
  never globally sorted.  At 10^10 docs, ``sample_mod`` is chosen so the
  sample stays ~10^6 rows (same bounded-driver-state class as the BPE
  merge loop, documented there); the single-partition rank window runs
  over the SAMPLE only, never the corpus.

Alphabet is pinned to 37 symbols (``a-z``, ``0-9``, space): text is
ASCII-normalised BEFORE lowercasing (``[^A-Za-z0-9 ]+`` → space, squeeze
runs, trim), so engine Unicode-lowercase differences cannot leak in.
Add-one (Laplace) smoothing over the pinned alphabet; a bigram whose
context was never seen in training scores ``ln(1/37)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: pinned alphabet size: a-z (26) + 0-9 (10) + space (1)
ALPHABET_V = 37


def _lm_norm(c) -> F.Column:
    """ASCII-pinned normalisation: non-[A-Za-z0-9 ] runs → single space,
    THEN lowercase (pure-ASCII input, so lower() is engine-identical),
    squeeze space runs, trim."""
    x = F.regexp_replace(c, "[^A-Za-z0-9 ]+", " ")
    x = F.lower(x)
    x = F.regexp_replace(x, " {2,}", " ")
    return F.trim(x)


def _bigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, bg) — one row per character bigram of the
    normalised text.  Docs shorter than 2 normalised chars emit no rows
    (``explode`` of the empty array), mirroring DuckDB's empty
    ``range(1, n)`` for n <= 1."""
    base = df.select("doc_id", "lang",
                     _lm_norm(F.col(text_col)).alias("t"))
    bgs = F.when(
        F.length("t") >= 2,
        F.expr("transform(sequence(1, length(t) - 1),"
               " i -> substring(t, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc_id", "lang", F.explode(bgs).alias("bg"))


def train_char_bigram_lm(docs: DataFrame, train_lang: str | None = "en",
                         text_col: str = "text",
                         cache=None) -> tuple[DataFrame, DataFrame]:
    """Train the add-one-smoothed character-bigram LM on the docs whose
    ``lang`` equals ``train_lang`` (CCNet trains on the target-language
    reference corpus); ``train_lang=None`` trains on the WHOLE corpus
    (the "raw distribution" model DSIR needs).

    Returns ``(model, contexts)``:

    * ``model``:    (bg, lp)   — lp = round(ln((c_ab+1)/(c_a+V))·1e4) as BIGINT
    * ``contexts``: (ctx, lp0) — backoff for unseen bigram in a seen
      context: lp0 = round(ln(1/(c_a+V))·1e4) as BIGINT

    Both are ≤ 37² rows — broadcast them at scoring time.
    """
    bg = _bigrams(docs, text_col)
    if train_lang is not None:
        bg = bg.where(F.col("lang") == train_lang)
    cab = (bg.groupBy(F.substring("bg", 1, 1).alias("ctx"),
                      F.col("bg"))
           .agg(F.count("*").alias("cab")))
    if cache is not None:
        # model AND contexts derive from cab; persisting the ≤37² -row
        # histogram means the training corpus is scanned once, not once
        # per derived table
        cab = cache(cab)
    ca = cab.groupBy("ctx").agg(F.sum("cab").alias("ca"))
    model = (cab.join(ca, "ctx")
             .select("bg",
                     F.round(F.log((F.col("cab") + F.lit(1.0))
                                   / (F.col("ca") + F.lit(float(ALPHABET_V))))
                             * 10000, 0).cast("bigint").alias("lp")))
    contexts = ca.select(
        "ctx",
        F.round(F.log(F.lit(1.0) / (F.col("ca") + F.lit(float(ALPHABET_V))))
                * 10000, 0).cast("bigint").alias("lp0"))
    return model, contexts


def score_nll(docs: DataFrame, model: DataFrame, contexts: DataFrame,
              text_col: str = "text") -> DataFrame:
    """(doc_id, nll10k, n_bigrams) — exact-integer negative
    log-likelihood (tenth-milli-nats) and bigram count per document.
    Docs with no bigrams after normalisation emit no row (CCNet drops
    empties)."""
    # ln(1/V) for a bigram whose context never occurred in training
    import math
    lp_cold = int(round(math.log(1.0 / ALPHABET_V) * 10000))
    bg = _bigrams(docs, text_col)
    scored = (bg
              .join(F.broadcast(model), "bg", "left")
              .join(F.broadcast(contexts),
                    F.substring("bg", 1, 1) == F.col("ctx"), "left")
              .select("doc_id",
                      F.coalesce(F.col("lp"), F.col("lp0"),
                                 F.lit(lp_cold).cast("bigint")).alias("lpx")))
    return (scored.groupBy("doc_id")
            .agg((-F.sum("lpx")).cast("bigint").alias("nll10k"),
                 F.count("*").cast("bigint").alias("n_bigrams")))


def dsir_logratio(docs: DataFrame, target_lang: str = "en",
                  sample_mod: int = 5, text_col: str = "text",
                  cache=None) -> DataFrame:
    """DSIR-style data selection by importance weighting (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — public paper; hashed-n-gram features simplified to
    this repo's pinned char-bigram LM): every doc's importance is the
    log-likelihood ratio between a TARGET model (trained on the clean
    ``target_lang`` slice) and a RAW model (trained on the whole
    corpus); docs most target-like are selected.

    All-integer discipline: ``logratio10k = nll_raw − nll_target``
    (both exact integer sums over the SAME bigram multiset, so
    ``n_bigrams`` cancels structurally and the ratio is an exact
    integer).  Deterministic selection rule (in place of the paper's
    gumbel resampling): keep the top quartile by mean log-ratio, cutoff
    derived from the ``doc_id % sample_mod == 3`` sample exactly as the
    CCNet tertiles are.

    Returns (doc_id, logratio10k, n_bigrams, selected).  Scale shape:
    two broadcast model joins on one bigram explode, one doc_id
    shuffle; the rank window runs over the bounded sample only.
    """
    model_t, ctx_t = train_char_bigram_lm(docs, target_lang, text_col)
    model_r, ctx_r = train_char_bigram_lm(docs, None, text_col)
    nt = score_nll(docs, model_t, ctx_t, text_col) \
        .withColumnRenamed("nll10k", "nll_t")
    nr = score_nll(docs, model_r, ctx_r, text_col) \
        .select("doc_id", F.col("nll10k").alias("nll_r"))
    scored = (nt.join(nr, "doc_id")
              .select("doc_id",
                      (F.col("nll_r") - F.col("nll_t")).cast("bigint")
                      .alias("logratio10k"),
                      "n_bigrams"))
    if cache is not None:
        scored = cache(scored)

    mean = (F.col("logratio10k") / F.col("n_bigrams"))
    samp = scored.where(F.col("doc_id") % sample_mod == 3)
    w = Window.orderBy(mean.asc(), F.col("doc_id").asc())
    ranked = samp.select(
        mean.alias("m"),
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("ns"))
    cut = ranked.agg(
        F.max(F.when(F.col("rk") == (F.col("ns") * 3 / 4).cast("bigint"),
                     F.col("m"))).alias("cut"))
    return (scored.crossJoin(F.broadcast(cut))
            .select("doc_id", "logratio10k", "n_bigrams",
                    (mean > F.col("cut")).alias("selected")))


def ccnet_buckets_perlang(docs: DataFrame, sample_mod: int = 5,
                          text_col: str = "text",
                          cache=None) -> DataFrame:
    """CCNet's actual per-language design: ONE bigram LM per language
    (trained on that language's own slice), every document scored under
    ITS language's model, and head/middle/tail tertiles computed PER
    LANGUAGE from the deterministic sample — so a zh doc competes with
    zh docs, not with en.

    Still one histogram pass (grouped by (lang, ctx, bg); model ≤
    n_langs · 37² rows → broadcast), one corpus shuffle (doc_id agg),
    and the rank window over the sample is now PARTITIONED BY lang —
    parallel, unlike the single-language variant's global window.
    Same exact-integer discipline throughout.

    Returns (doc_id, lang, nll10k, n_bigrams, bucket).
    """
    bg = _bigrams(docs, text_col)
    cab = (bg.groupBy("lang", F.substring("bg", 1, 1).alias("ctx"),
                      F.col("bg"))
           .agg(F.count("*").alias("cab")))
    if cache is not None:
        cab = cache(cab)
    ca = cab.groupBy("lang", "ctx").agg(F.sum("cab").alias("ca"))
    model = (cab.join(ca, ["lang", "ctx"])
             .select("lang", "bg",
                     F.round(F.log((F.col("cab") + F.lit(1.0))
                                   / (F.col("ca")
                                      + F.lit(float(ALPHABET_V))))
                             * 10000, 0).cast("bigint").alias("lp")))
    contexts = ca.select(
        "lang", "ctx",
        F.round(F.log(F.lit(1.0) / (F.col("ca") + F.lit(float(ALPHABET_V))))
                * 10000, 0).cast("bigint").alias("lp0"))

    import math
    lp_cold = int(round(math.log(1.0 / ALPHABET_V) * 10000))
    # contexts shares lineage with bg — rename its join keys so the
    # non-equi condition can't be ambiguous
    ctx2 = contexts.select(F.col("lang").alias("clang"), "ctx", "lp0")
    scored = (bg
              .join(F.broadcast(model), ["lang", "bg"], "left")
              .join(F.broadcast(ctx2),
                    (F.col("lang") == F.col("clang"))
                    & (F.substring("bg", 1, 1) == F.col("ctx")),
                    "left")
              .select("doc_id", "lang",
                      F.coalesce(F.col("lp"), F.col("lp0"),
                                 F.lit(lp_cold).cast("bigint"))
                      .alias("lpx"))
              .groupBy("doc_id", "lang")
              .agg((-F.sum("lpx")).cast("bigint").alias("nll10k"),
                   F.count("*").cast("bigint").alias("n_bigrams")))
    if cache is not None:
        scored = cache(scored)

    mean = (F.col("nll10k") / F.col("n_bigrams"))
    samp = scored.where(F.col("doc_id") % sample_mod == 3)
    w = Window.partitionBy("lang").orderBy(mean.asc(),
                                           F.col("doc_id").asc())
    ranked = samp.select(
        "lang", mean.alias("m"),
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("lang")).alias("ns"))
    cuts = ranked.groupBy("lang").agg(
        F.max(F.when(F.col("rk") == (F.col("ns") / 3).cast("bigint"),
                     F.col("m"))).alias("cut1"),
        F.max(F.when(F.col("rk") == (F.col("ns") * 2 / 3).cast("bigint"),
                     F.col("m"))).alias("cut2"))

    return (scored.join(F.broadcast(cuts), "lang")
            .select("doc_id", "lang", "nll10k", "n_bigrams",
                    F.when(mean <= F.col("cut1"), F.lit("head"))
                    .when(mean <= F.col("cut2"), F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("bucket")))


def caption_ppl_gate(imgs: DataFrame, train_docs: DataFrame | None,
                     train_lang: str = "en",
                     max_mean_nll10k: int = 17500,
                     id_col: str = "image_id",
                     caption_col: str = "caption",
                     _model: DataFrame | None = None,
                     _contexts: DataFrame | None = None) -> DataFrame:
    """Caption-quality gate for the image-caption corpus (the
    LAION/DataComp text-side filter, CCNet-style): score every caption
    under the char-bigram LM trained on the clean DOCUMENT slice
    (cross-table, exactly CCNet's reference-corpus-to-web-text shape)
    and keep iff mean NLL ≤ the pinned threshold.

    The keep rule is ENTIRELY integer — ``nll10k <= max_mean_nll10k *
    n_bigrams`` — so there is not a single double anywhere in the
    decision.  Captions that normalise to < 2 chars fail the gate
    (nothing to score ⇒ not evidence of quality).

    Returns (id_col, nll10k, n_bigrams, cap_ok).  Scale shape: model is
    broadcast; the caption corpus shuffles once on ``id_col``.

    Pass ``_model``/``_contexts`` (from :func:`train_char_bigram_lm`)
    to reuse an offline-trained model instead of ``train_docs`` — the
    train-offline / score-online path the streaming shard packer uses.
    """
    if _model is not None:
        model, contexts = _model, _contexts
    else:
        model, contexts = train_char_bigram_lm(train_docs, train_lang)
    cap_docs = imgs.select(F.col(id_col).alias("doc_id"),
                           F.lit(train_lang).alias("lang"),
                           F.col(caption_col).alias("text"))
    scored = score_nll(cap_docs, model, contexts)
    nll = F.coalesce(F.col("nll10k"), F.lit(0)).cast("bigint")
    nbg = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint")
    return (imgs.select(F.col(id_col))
            .join(scored.withColumnRenamed("doc_id", id_col),
                  id_col, "left")
            .select(id_col, nll.alias("nll10k"), nbg.alias("n_bigrams"),
                    ((nbg > 0)
                     & (nll <= F.lit(max_mean_nll10k) * nbg))
                    .alias("cap_ok")))


def ccnet_buckets(docs: DataFrame, train_lang: str = "en",
                  sample_mod: int = 5, text_col: str = "text",
                  cache=None, cache_model=None) -> DataFrame:
    """The full CCNet pipeline: train → score → bucket.

    Returns (doc_id, nll10k, n_bigrams, bucket) with bucket ∈
    {'head','middle','tail'} by mean-NLL tertiles of the deterministic
    sample (``doc_id % sample_mod == 3``).  The bucket comparison uses
    ``nll10k / n_bigrams`` — one IEEE double division of exact integers,
    bit-identical across engines; ties in the sample rank are broken by
    ``doc_id``.
    """
    model, contexts = train_char_bigram_lm(docs, train_lang, text_col,
                                           cache=cache_model)
    scored = score_nll(docs, model, contexts, text_col)
    if cache is not None:
        # scored feeds BOTH the sample-cutoff branch and the final
        # bucket projection — persist it so the corpus is scored once,
        # not twice (same `cache` hook contract as semantic_dedup)
        scored = cache(scored)
    mean = (F.col("nll10k") / F.col("n_bigrams"))

    samp = scored.where(F.col("doc_id") % sample_mod == 3)
    w = Window.orderBy(mean.asc(), F.col("doc_id").asc())
    ranked = samp.select(
        mean.alias("m"),
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("ns"))
    cuts = ranked.agg(
        F.max(F.when(F.col("rk") == (F.col("ns") / 3).cast("bigint"),
                     F.col("m"))).alias("cut1"),
        F.max(F.when(F.col("rk") == (F.col("ns") * 2 / 3).cast("bigint"),
                     F.col("m"))).alias("cut2"))

    return (scored.crossJoin(F.broadcast(cuts))
            .select("doc_id", "nll10k", "n_bigrams",
                    F.when(mean <= F.col("cut1"), F.lit("head"))
                    .when(mean <= F.col("cut2"), F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("bucket")))
