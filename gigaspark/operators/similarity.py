"""Embedding similarity search (ANN) for training-data pipelines.

Gigablast's nearest "vector" machinery is summary-vector dedup and
clusterdb similarity (``Msg40.cpp`` dedup pass [U][M]); this module is
the corpus-scale generalization over ``embeddings(vec_id, embedding
array<float>, label)``:

  * :func:`cosine_topk`      — brute-force exact cosine top-k (baseline)
  * :func:`rp_signatures` / :func:`lsh_topk`
                             — random-hyperplane LSH bucketing (scale path)

Numeric contract (lets a DuckDB oracle reproduce values bit-for-bit):
embeddings are quantized to ``floor(x*1000+0.5)`` int64 once, all dot
products / norms are EXACT integer arithmetic, and only the final cosine
does one IEEE-double divide+sqrt, rounded to 4 decimals.  No Python UDFs:
``F.zip_with`` + ``F.aggregate`` run JVM-side.

Scale design (10^9+ vectors): brute force is the per-query fallback —
queries broadcast against the corpus (one map-side pass, partial top-k
per partition via TakeOrderedAndProject, no shuffle of the corpus).  The
LSH path buckets the corpus once by signature (uniform md5-seeded
hyperplanes → balanced buckets) and probes only matching buckets —
candidate set shrinks by ~2^bits/multi-probe.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

QUANT = 1000


def _md5_int32(s: str) -> int:
    """Same value as functions.text.md5_int, computed driver-side."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic integer hyperplanes: w[p][d] = md5_int(f"rp:{p}:{d}")
    % 2001 - 1000 — reproducible in any engine with md5."""
    return [
        [(_md5_int32(f"rp:{p}:{d}") % 2001) - 1000 for d in range(dim)]
        for p in range(n_planes)
    ]


def quantize(col: Column) -> Column:
    """array<float> → array<long>, floor(x*1000 + 0.5) (exact from then
    on).  floor of IEEE mult/add is bit-identical cross-engine; the
    engines' round() half-rule (HALF_UP vs half-even/away) splits when
    x*1000 lands exactly on .5 — observed once at sf0.1."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Exact-integer cosine, rounded to 4 decimals (oracle contract)."""
    return F.round(
        int_dot(a, b)
        / F.sqrt(int_dot(a, a).cast("double") * int_dot(b, b).cast("double")),
        4,
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbours per query: (q_id, n_id, cos, rank).

    ``queries`` is small → broadcast; the corpus is scanned once map-side
    and the per-query top-k is a rank window over (cos desc, n_id asc) —
    total order, deterministic under any parallelism.
    """
    q = queries.select(F.col("vec_id").alias("q_id"),
                       quantize(F.col("embedding")).alias("qv"))
    c = corpus.select(F.col("vec_id").alias("n_id"),
                      quantize(F.col("embedding")).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def rp_signatures(vecs: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """(vec_id, sig): random-hyperplane sign signature as a long bitmap.
    One narrow pass; planes are column literals (no shuffle, no UDF)."""
    planes = hyperplanes(n_planes, dim)
    qv = quantize(F.col("embedding"))
    sig = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        wcol = F.array(*[F.lit(x).cast("long") for x in w])
        sig = sig + F.when(int_dot(qv, wcol) > 0,
                           F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return vecs.select("vec_id", sig.alias("sig"))


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.9,
                            n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cos) with
    a_id < b_id and cos ≥ threshold, candidates limited to identical
    random-hyperplane signature buckets (the dedup-by-embedding mandate;
    clusterdb-style similarity collapse, ``Msg40.cpp`` dedup pass [U][M]).

    Scale: the self-join keys on the signature — near-identical vectors
    agree on every plane's sign with probability 1 − θ/π per plane, so at
    high thresholds recall ≈ 1 while each bucket holds ~corpus/2^n_planes
    vectors; cosine is exact-integer within buckets (oracle contract).
    """
    sig = rp_signatures(corpus, n_planes, dim)
    v = (corpus.join(sig, "vec_id")
         .select("vec_id", "sig", quantize(F.col("embedding")).alias("v")))
    a = v.select(F.col("vec_id").alias("a_id"), "sig", F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("b_id"), "sig", F.col("v").alias("vb"))
    return (
        a.join(b, "sig")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Bucketed ANN: score only corpus vectors whose signature equals the
    query's (multi-probe = hamming-1 neighbourhoods left as a knob).
    Returns (q_id, n_id, cos, rank) — approximate: recall < 1 by design.
    """
    csig = rp_signatures(corpus, n_planes, dim)
    qsig = rp_signatures(queries, n_planes, dim)
    c = (corpus.join(csig, "vec_id")
         .select(F.col("vec_id").alias("n_id"), "sig",
                 quantize(F.col("embedding")).alias("cv")))
    q = (queries.join(qsig, "vec_id")
         .select(F.col("vec_id").alias("q_id"), "sig",
                 quantize(F.col("embedding")).alias("qv")))
    scored = (
        c.join(F.broadcast(q), "sig")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def int_l2(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_centroids`` corpus
    vectors ranked first by ``md5(vec_id)`` serve as centroids
    (uniform pseudo-random, reproducible in any md5-capable engine —
    the oracle contract).  At cluster scale, swap in k-means-trained
    centroids; the search path below is unchanged (IVF-Flat shape).

    Plan: global top-K by md5 is TakeOrdered (no full sort shuffle);
    the result is K rows → broadcast everywhere downstream."""
    return (
        corpus.select(quantize(F.col("embedding")).alias("cvec"),
                      F.md5(F.col("vec_id").cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .withColumn("cid", F.row_number().over(Window.orderBy("_h")))
        .select("cid", "cvec")
    )


def kmeans_refine(vecs: DataFrame, centroids: DataFrame,
                  n_iter: int = 2, by: tuple[str, ...] = ()) -> DataFrame:
    """Pinned-integer Lloyd refinement of the IVF coarse quantizer
    (the k-means training a production IVF index runs; integer
    arithmetic end-to-end so a SQL oracle reproduces every centroid
    bit-for-bit).

    ``vecs``: (vec_id, v array<long>) quantized; ``centroids``:
    (cid, cvec array<long>) the seed (e.g. :func:`ivf_centroids`).

    Pinned rules per iteration:
      * assignment: exact integer squared-L2 argmin, ties → lowest cid
        (expressed as min-dist-then-min-cid, no struct comparison —
        portable to any engine);
      * update: per-dimension floor(sum/count) — floor division toward
        -inf in BOTH engines (never `div`, which truncates toward zero
        on negatives in Spark but floors in DuckDB);
      * empty cluster: keeps its previous centroid.

    ``by``: extra grouping key columns present in BOTH inputs — pass
    ``("j",)`` to train one codebook per PQ subspace in a single plan
    (the assignment join keys on the group instead of a crossJoin).

    Plan per iteration: one broadcast join (K centroid rows per group)
    + two doc-keyed aggs + one (group, cid, dim) agg — the corpus
    never shuffles for assignment; only the exploded per-dimension
    means do, and that shuffle is groups·K·dim rows."""
    by = list(by)
    cent = centroids
    vkey = ["vec_id", *by]
    for _ in range(n_iter):
        paired = (vecs.join(F.broadcast(cent), by) if by
                  else vecs.crossJoin(F.broadcast(cent)))
        d = paired.select(*vkey, "cid",
                          int_l2(F.col("v"), F.col("cvec")).alias("dist"))
        dmin = d.groupBy(*vkey).agg(F.min("dist").alias("dmin"))
        a = (d.join(dmin, vkey)
             .where(F.col("dist") == F.col("dmin"))
             .groupBy(*vkey).agg(F.min("cid").alias("cid")))
        ex = (a.join(vecs, vkey)
              .select(*by, "cid", F.posexplode("v").alias("dim", "val")))
        m = (ex.groupBy(*by, "cid", "dim")
             .agg(F.floor(F.sum("val") / F.count("*")).cast("long")
                  .alias("mv")))
        newc = (m.groupBy(*by, "cid")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "mv")))
                     .alias("s"))
                .select(*by, "cid", F.transform("s", lambda t: t["mv"])
                        .alias("ncvec")))
        cent = (cent.join(newc, [*by, "cid"], "left")
                .select(*by, "cid",
                        F.coalesce("ncvec", "cvec").alias("cvec")))
    return cent


def ivf_assign(vecs: DataFrame, centroids: DataFrame, id_alias: str,
               n_assign: int = 1) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids by exact
    integer squared-L2 (ties → lowest cid).  One map-side pass: the
    centroid table is broadcast, argmin is a per-vector window over K
    rows — no corpus shuffle."""
    v = vecs.select(F.col("vec_id").alias(id_alias),
                    quantize(F.col("embedding")).alias("v"))
    d = (v.crossJoin(F.broadcast(centroids))
         .withColumn("dist", int_l2(F.col("v"), F.col("cvec"))))
    w = Window.partitionBy(id_alias).orderBy(F.col("dist").asc(),
                                             F.col("cid").asc())
    return (d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n_assign)
            .select(id_alias, "cid", "v"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 2) -> DataFrame:
    """IVF-Flat ANN: corpus vectors live in exactly one inverted list
    (nearest centroid); each query probes its ``nprobe`` nearest lists
    and scores exact integer cosine only there.  Returns (q_id, n_id,
    cos, rank) — approximate: recall < 1 when a true neighbour hashes
    to an unprobed list.

    Scale: the corpus is scanned once for assignment (broadcast
    centroids, no shuffle), then shuffled once on cid — uniform when
    centroids are representative; probe joins touch ~nprobe/K of the
    corpus per query instead of all of it.  Each (q, n) pair appears at
    most once (a corpus vector has one list)."""
    cent = ivf_centroids(corpus, n_centroids)
    c = ivf_assign(corpus, cent, "n_id", 1)
    q = (ivf_assign(queries, cent, "q_id", nprobe)
         .select("q_id", "cid", F.col("v").alias("qv")))
    scored = (
        c.join(F.broadcast(q), "cid")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def lsh_topk_multiprobe(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        n_planes: int = 8, dim: int = 64,
                        probe_hamming: int = 1) -> DataFrame:
    """Multi-probe RP-LSH ANN: each query probes its own signature
    bucket PLUS every bucket within ``probe_hamming`` bit flips
    (classic multi-probe LSH — recall of many more hash tables for the
    memory of one).  probe_hamming=1 → 1+n_planes probes per query.

    Scale: probes are generated by exploding a small literal array of
    XOR masks over the (tiny, broadcast) query side — the corpus side
    is untouched (still one signature per vector, one shuffle-free
    bucketed join).  Returns (q_id, n_id, cos, rank)."""
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming supported up to 1 (mask explosion "
                         "grows as C(n_planes, h))")
    masks = [0] + ([1 << p for p in range(n_planes)] if probe_hamming else [])
    csig = rp_signatures(corpus, n_planes, dim)
    qsig = rp_signatures(queries, n_planes, dim)
    c = (corpus.join(csig, "vec_id")
         .select(F.col("vec_id").alias("n_id"), "sig",
                 quantize(F.col("embedding")).alias("cv")))
    q = (queries.join(qsig, "vec_id")
         .select(F.col("vec_id").alias("q_id"), "sig",
                 quantize(F.col("embedding")).alias("qv"))
         .withColumn("m", F.explode(F.array(
             *[F.lit(m).cast("long") for m in masks])))
         .select("q_id", "qv",
                 F.col("sig").bitwiseXOR(F.col("m")).alias("sig")))
    scored = (
        c.join(F.broadcast(q), "sig")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def pq_codebooks(corpus: DataFrame, m: int = 8, n_codes: int = 16,
                 dim: int = 64) -> DataFrame:
    """Product-quantization codebooks: per subspace j (dim/m dims), the
    ``n_codes`` corpus subvectors ranked first by md5(vec_id) — one
    deterministic whole-vector sample sliced per subspace (uniform
    pseudo-random, reproducible in any md5-capable engine; at cluster
    scale swap in k-means sub-codebooks, the search path is
    unchanged).  Output (j, cid, csub) — m*n_codes rows, broadcast
    everywhere downstream."""
    d = dim // m
    sample = (corpus.select(quantize(F.col("embedding")).alias("v"),
                            F.md5(F.col("vec_id").cast("string")).alias("_h"))
              .orderBy("_h").limit(n_codes)
              .withColumn("cid", F.row_number().over(Window.orderBy("_h"))))
    return (sample.select("cid", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(F.col("v"), j * d + 1, d).alias("csub"))
        for j in range(m)])).alias("e"))
        .select(F.col("e.j").alias("j"), "cid", F.col("e.csub").alias("csub")))


def pq_encode(vecs: DataFrame, books: DataFrame, id_alias: str,
              m: int = 8, dim: int = 64) -> DataFrame:
    """PQ encode: each vector becomes m sub-codes (nearest sub-codebook
    entry by exact integer squared-L2, ties → lowest cid).  This is the
    100-TB memory story: m bytes replace dim floats per vector (here
    kept relational as (id, j, code) rows).  Map-side only — codebooks
    broadcast, argmin is a window over n_codes rows per subvector."""
    d = dim // m
    sub = (vecs.select(F.col("vec_id").alias(id_alias),
                       quantize(F.col("embedding")).alias("v"))
           .select(id_alias, F.explode(F.array(*[
               F.struct(F.lit(j).alias("j"),
                        F.slice(F.col("v"), j * d + 1, d).alias("vsub"))
               for j in range(m)])).alias("e"))
           .select(id_alias, F.col("e.j").alias("j"),
                   F.col("e.vsub").alias("vsub")))
    dist = (sub.join(F.broadcast(books), "j")
            .withColumn("dist", int_l2(F.col("vsub"), F.col("csub"))))
    w = Window.partitionBy(id_alias, "j").orderBy(F.col("dist").asc(),
                                                  F.col("cid").asc())
    return (dist.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(id_alias, "j", F.col("cid").alias("code")))


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 8, n_codes: int = 16, dim: int = 64) -> DataFrame:
    """PQ search with Asymmetric Distance Computation: queries compute
    exact sub-distances to every codebook entry (the ADC lookup table,
    nq*m*n_codes rows — broadcast-sized), corpus vectors contribute
    only their m codes, and the approximate distance is the
    table-lookup sum.  Returns (q_id, n_id, adist, rank) — pure
    integer arithmetic end to end (the DuckDB oracle reproduces it
    exactly).

    Scale: the corpus-side input is the CODES table (m small ints per
    vector — the compressed representation that fits where raw vectors
    don't); the scan is one broadcast-join + sum, and composing with
    the IVF coarse quantizer (ivf_topk's list pruning) bounds it to
    probed lists."""
    d = dim // m
    books = pq_codebooks(corpus, m, n_codes, dim)
    codes = pq_encode(corpus, books, "n_id", m, dim)
    qsub = (queries.select(F.col("vec_id").alias("q_id"),
                           quantize(F.col("embedding")).alias("v"))
            .select("q_id", F.explode(F.array(*[
                F.struct(F.lit(j).alias("j"),
                         F.slice(F.col("v"), j * d + 1, d).alias("qsub"))
                for j in range(m)])).alias("e"))
            .select("q_id", F.col("e.j").alias("j"),
                    F.col("e.qsub").alias("qsub")))
    adc = (qsub.join(F.broadcast(books), "j")
           .select("q_id", "j", F.col("cid").alias("code"),
                   int_l2(F.col("qsub"), F.col("csub")).alias("sdist")))
    scored = (codes.join(F.broadcast(adc), ["j", "code"])
              .where(F.col("n_id") != F.col("q_id"))
              .groupBy("q_id", "n_id")
              .agg(F.sum("sdist").alias("adist"),
                   F.count("*").alias("_m"))
              .where(F.col("_m") == m))     # guard: all m subspaces present
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", F.col("adist").cast("long").alias("adist"),
                    "rank"))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 16, nprobe: int = 2, m: int = 8,
               n_codes: int = 16, dim: int = 64) -> DataFrame:
    """IVF-PQ — the production ANN shape at 10^10 vectors: the coarse
    quantizer prunes the scan to ``nprobe`` inverted lists AND the
    in-list vectors are PQ codes of their RESIDUAL (v - centroid), so
    memory holds m sub-codes per vector instead of dim floats.
    Queries build one ADC table per probed list (the query residual
    differs per list).  Integer arithmetic end to end; (q_id, n_id,
    adist, rank) — approximate on two axes (list pruning + PQ), both
    reproduced exactly by the oracle."""
    d = dim // m
    cent = ivf_centroids(corpus, n_centroids)
    cass = ivf_assign(corpus, cent, "n_id", 1)          # (n_id, cid, v)
    res = (cass.join(F.broadcast(cent), "cid")
           .select("n_id", "cid",
                   F.zip_with("v", "cvec", lambda a, b: a - b).alias("r")))
    # residual sub-codebooks: md5-ordered sample of residuals
    sample = (res.join(
        corpus.select(F.col("vec_id").alias("n_id"),
                      F.md5(F.col("vec_id").cast("string")).alias("_h")),
        "n_id")
        .orderBy("_h").limit(n_codes)
        .withColumn("code", F.row_number().over(Window.orderBy("_h"))))
    books = (sample.select("code", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(F.col("r"), j * d + 1, d).alias("csub"))
        for j in range(m)])).alias("e"))
        .select(F.col("e.j").alias("j"), "code",
                F.col("e.csub").alias("csub")))
    rsub = (res.select("n_id", "cid", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(F.col("r"), j * d + 1, d).alias("vsub"))
        for j in range(m)])).alias("e"))
        .select("n_id", "cid", F.col("e.j").alias("j"),
                F.col("e.vsub").alias("vsub")))
    dist = (rsub.join(F.broadcast(books), "j")
            .withColumn("dist", int_l2(F.col("vsub"), F.col("csub"))))
    w = Window.partitionBy("n_id", "j").orderBy(F.col("dist").asc(),
                                                F.col("code").asc())
    codes = (dist.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("n_id", "cid", "j", "code"))
    # query side: nprobe lists, residual per list, ADC table per list
    qass = (ivf_assign(queries, cent, "q_id", nprobe)
            .join(F.broadcast(cent), "cid")
            .select("q_id", "cid",
                    F.zip_with("v", "cvec", lambda a, b: a - b).alias("qr")))
    qsub = (qass.select("q_id", "cid", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(F.col("qr"), j * d + 1, d).alias("qsub"))
        for j in range(m)])).alias("e"))
        .select("q_id", "cid", F.col("e.j").alias("j"),
                F.col("e.qsub").alias("qsub")))
    adc = (qsub.join(F.broadcast(books), "j")
           .select("q_id", "cid", "j", "code",
                   int_l2(F.col("qsub"), F.col("csub")).alias("sdist")))
    scored = (codes.join(F.broadcast(adc), ["cid", "j", "code"])
              .where(F.col("n_id") != F.col("q_id"))
              .groupBy("q_id", "n_id")
              .agg(F.sum("sdist").alias("adist"), F.count("*").alias("_m"))
              .where(F.col("_m") == m))
    w2 = Window.partitionBy("q_id").orderBy(F.col("adist").asc(),
                                            F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", F.col("adist").cast("long").alias("adist"),
                    "rank"))


def semantic_dedup(corpus: DataFrame, n_centroids: int = 16,
                   threshold: float = 0.95,
                   cache=lambda df: df) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540; the embedding-space generalization of the
    clusterdb similarity collapse, ``Msg40.cpp`` dedup pass [U][M]):
    partition the embedding space with the deterministic coarse
    quantizer, then WITHIN each cluster drop every vector whose
    exact-integer cosine with a LOWER-id vector of the same cluster
    reaches ``threshold``.  Returns (vec_id, cid, keep).

    Pinned keep rule: first-id wins (x is dropped iff ∃ y < x in x's
    cluster with cos(x, y) ≥ threshold) — deterministic and engine-
    portable; compose with :func:`gigaspark.operators.dedup.
    connected_components` when transitive-closure groups are wanted.

    Scale: candidate generation IS the cluster partition — the corpus
    shuffles ONCE on cid (with k-means-sized K the lists are
    corpus/K ≈ bounded), pairs are per-list self-joins, never
    all-pairs; the decision is a distinct + left-anti within the list.
    Approximate by design exactly where SemDeDup is: cross-cluster
    near-dups are not compared (raise n_assign/centroid overlap to
    trade cost for recall).

    ``cache``: the assignment feeds THREE plan branches (keep side +
    both pair sides) — pass a persist hook (e.g. the entry's
    ``_cache_slot``) so the corpus is scanned and assigned ONCE, not
    three times.
    """
    cent = ivf_centroids(corpus, n_centroids)
    assign = cache(ivf_assign(corpus, cent, "vec_id", 1))  # (vec_id, cid, v)
    a = assign.select(F.col("vec_id").alias("a_id"), "cid",
                      F.col("v").alias("va"))
    b = assign.select(F.col("vec_id").alias("b_id"), "cid",
                      F.col("v").alias("vb"))
    dup = (a.join(b, "cid")
           .where(F.col("a_id") < F.col("b_id"))
           .where(cosine(F.col("va"), F.col("vb")) >= threshold)
           .select(F.col("b_id").alias("vec_id"))
           .distinct()
           .withColumn("_dup", F.lit(True)))
    return (assign.join(dup, "vec_id", "left")
            .select("vec_id", "cid",
                    F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")))
