"""Unit tests for embedding similarity search (brute-force + RP-LSH)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gigaspark.operators.similarity import (
    cosine_topk, hyperplanes, lsh_topk, rp_signatures,
)

DIM = 8


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    # vec 100 = near-copy of vec 0 (tiny perturbation)
    base = np.array(rows[0][1])
    rows.append((100, [float(x) for x in base + 0.001]))
    # vec 101 = exact negation of vec 1
    rows.append((101, [float(-x) for x in rows[1][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk(vecs):
    qs = vecs.where(F.col("vec_id").isin(0, 1))
    res = cosine_topk(vecs, qs, k=3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["n_id"], r["cos"]))
    # nearest to 0 is its near-copy 100, cosine ≈ 1
    top0 = sorted(by_q[0])[0]
    assert top0[1] == 100 and top0[2] >= 0.999
    # negation of 1 must NOT be in 1's top-3 (cosine = -1)
    assert all(n != 101 for _, n, _ in by_q[1])
    assert all(len(v) == 3 for v in by_q.values())


def test_hyperplanes_deterministic():
    assert hyperplanes(4, DIM) == hyperplanes(4, DIM)
    flat = [x for w in hyperplanes(8, 64) for x in w]
    assert all(-1000 <= x <= 1000 for x in flat)


def test_rp_signature_locality(vecs, spark):
    sigs = {r["vec_id"]: r["sig"]
            for r in rp_signatures(vecs, n_planes=8, dim=DIM).collect()}
    assert sigs[0] == sigs[100]           # near-copies share the bucket
    assert sigs[1] ^ sigs[101] == 0xFF    # negation flips every sign bit


def test_lsh_topk_subset_of_bruteforce(vecs):
    qs = vecs.where(F.col("vec_id") == 0)
    exact = {(r["q_id"], r["n_id"]) for r in cosine_topk(vecs, qs, k=10).collect()}
    approx = lsh_topk(vecs, qs, k=10, n_planes=8, dim=DIM).collect()
    # every LSH hit is a real vector pair with correctly-computed cosine,
    # and the top hit (the near-copy, same bucket by construction) is found
    assert any(r["n_id"] == 100 and r["rank"] == 1 for r in approx)
    for r in approx:
        assert (r["q_id"], r["n_id"]) in exact or r["cos"] <= 1.0


def test_ivf_assignment_invariants(vecs):
    from gigaspark.operators.similarity import ivf_assign, ivf_centroids

    cent = ivf_centroids(vecs, n_centroids=4)
    crows = cent.collect()
    assert [r["cid"] for r in sorted(crows, key=lambda r: r["cid"])] == [1, 2, 3, 4]
    assigned = ivf_assign(vecs, cent, "n_id", 1)
    counts = assigned.groupBy("n_id").count().collect()
    # every vector in exactly ONE inverted list
    assert all(r["count"] == 1 for r in counts) and len(counts) == 42
    probes = ivf_assign(vecs.where(F.col("vec_id") == 0), cent, "q_id", 2)
    assert probes.count() == 2            # nprobe lists per query
    assert probes.select("cid").distinct().count() == 2


def test_ivf_topk_finds_planted_neighbour(vecs):
    """near-copy lands in the same inverted list (closest centroid is
    determined by the vector itself), so IVF must rank it #1; every
    IVF hit's cosine agrees with brute force."""
    from gigaspark.operators.similarity import ivf_topk

    qs = vecs.where(F.col("vec_id") == 0)
    res = ivf_topk(vecs, qs, k=5, n_centroids=4, nprobe=2).collect()
    assert any(r["n_id"] == 100 and r["rank"] == 1 for r in res)
    exact = {(r["q_id"], r["n_id"]): r["cos"]
             for r in cosine_topk(vecs, qs, k=41).collect()}
    for r in res:
        assert exact[(r["q_id"], r["n_id"])] == r["cos"]


def test_ivf_deterministic(vecs):
    from gigaspark.operators.similarity import ivf_topk

    qs = vecs.where(F.col("vec_id").isin(0, 1))
    a = sorted(map(tuple, ivf_topk(vecs, qs, k=3, n_centroids=4).collect()))
    b = sorted(map(tuple, ivf_topk(vecs, qs, k=3, n_centroids=4).collect()))
    assert a == b


def test_multiprobe_superset_of_single_probe(vecs):
    """hamming-1 probing can only ADD candidates: every single-probe
    hit appears in the multi-probe result with the same cosine, and
    each (q, n) pair appears exactly once (one sig per corpus vector)."""
    from gigaspark.operators.similarity import lsh_topk_multiprobe

    qs = vecs.where(F.col("vec_id") == 0)
    single = lsh_topk(vecs, qs, k=41, n_planes=8, dim=DIM).collect()
    multi = lsh_topk_multiprobe(vecs, qs, k=41, n_planes=8, dim=DIM,
                                probe_hamming=1).collect()
    s_pairs = {(r["q_id"], r["n_id"]): r["cos"] for r in single}
    m_pairs = {}
    for r in multi:
        key = (r["q_id"], r["n_id"])
        assert key not in m_pairs          # no duplicate pairs
        m_pairs[key] = r["cos"]
    assert set(s_pairs) <= set(m_pairs)
    for p, c in s_pairs.items():
        assert m_pairs[p] == c
    assert len(m_pairs) >= len(s_pairs)
    # probe_hamming=0 must equal the single-probe path exactly
    zero = lsh_topk_multiprobe(vecs, qs, k=41, n_planes=8, dim=DIM,
                               probe_hamming=0).collect()
    assert sorted(map(tuple, zero)) == sorted(map(tuple, single))


def test_pq_adc_finds_planted_neighbour(vecs):
    """PQ with 8 subspaces x 1 dim (DIM=8 fixture): a near-copy encodes
    to the same (or nearest) sub-codes in every subspace, so ADC must
    rank it #1 for its source; adist is non-negative, monotone with
    rank, and deterministic across runs."""
    from gigaspark.operators.similarity import pq_adc_topk

    qs = vecs.where(F.col("vec_id") == 0)
    res = sorted(pq_adc_topk(vecs, qs, k=5, m=8, n_codes=8, dim=DIM)
                 .collect(), key=lambda r: r["rank"])
    assert res[0]["n_id"] == 100                 # the planted near-copy
    adists = [r["adist"] for r in res]
    assert adists == sorted(adists) and all(a >= 0 for a in adists)
    res2 = sorted(pq_adc_topk(vecs, qs, k=5, m=8, n_codes=8, dim=DIM)
                  .collect(), key=lambda r: r["rank"])
    assert [(r["n_id"], r["adist"]) for r in res] == \
        [(r["n_id"], r["adist"]) for r in res2]


def test_pq_codes_shape(vecs):
    """Every vector gets exactly m codes, each within the codebook."""
    from gigaspark.operators.similarity import pq_codebooks, pq_encode

    books = pq_codebooks(vecs, m=4, n_codes=8, dim=DIM)
    codes = pq_encode(vecs, books, "n_id", m=4, dim=DIM).collect()
    n_vec = vecs.count()
    assert len(codes) == n_vec * 4
    assert all(1 <= r["code"] <= 8 for r in codes)
    per = {}
    for r in codes:
        per.setdefault(r["n_id"], set()).add(r["j"])
    assert all(v == {0, 1, 2, 3} for v in per.values())


def test_ivfpq_finds_planted_neighbour(vecs):
    """IVF-PQ: the near-copy shares its source's coarse list AND its
    residual encodes to (near-)identical sub-codes → must rank #1."""
    from gigaspark.operators.similarity import ivfpq_topk

    qs = vecs.where(F.col("vec_id") == 0)
    res = sorted(ivfpq_topk(vecs, qs, k=5, n_centroids=4, nprobe=2,
                            m=4, n_codes=8, dim=DIM).collect(),
                 key=lambda r: r["rank"])
    # at this tiny codebook (4x8) other vectors can quantize to the
    # SAME codes (adist tie, broken by n_id) — the planted copy must
    # sit at the minimum adist regardless
    by_id = {r["n_id"]: r["adist"] for r in res}
    assert 100 in by_id and by_id[100] == min(by_id.values())
    adists = [r["adist"] for r in res]
    assert adists == sorted(adists) and all(a >= 0 for a in adists)


def test_kmeans_refine_inertia_and_empty_clusters(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from gigaspark.operators.similarity import int_l2, kmeans_refine

    # two tight planted blobs + one far-away seed that captures nothing
    rng = [(i, [int(1000 + (i * 37) % 9), int(-2000 + (i * 53) % 9)])
           for i in range(20)]
    rng += [(100 + i, [int(9000 + (i * 31) % 9), int(4000 + (i * 41) % 9)])
            for i in range(20)]
    vecs = spark.createDataFrame(rng, "vec_id long, v array<long>")
    seeds = spark.createDataFrame(
        [(1, [0, 0]), (2, [8000, 3000]), (3, [-999999, -999999])],
        "cid long, cvec array<long>")

    def inertia(cent):
        d = (vecs.crossJoin(F.broadcast(cent))
             .select("vec_id", int_l2(F.col("v"), F.col("cvec")).alias("dist"))
             .groupBy("vec_id").agg(F.min("dist").alias("m")))
        return d.agg(F.sum("m")).collect()[0][0]

    i0 = inertia(seeds)
    c1 = kmeans_refine(vecs, seeds, n_iter=1)
    i1 = inertia(c1)
    c2 = kmeans_refine(vecs, seeds, n_iter=2)
    i2 = inertia(c2)
    assert i1 <= i0 and i2 <= i1          # Lloyd never increases inertia
    got = {r["cid"]: r["cvec"] for r in c2.collect()}
    assert got[3] == [-999999, -999999]   # empty cluster keeps its seed
    # refined centroids sit inside their blobs
    assert 1000 <= got[1][0] <= 1009 and -2000 <= got[1][1] <= -1991
    assert 9000 <= got[2][0] <= 9009 and 4000 <= got[2][1] <= 4009


def test_pq_training_reduces_quantization_error(spark):
    from pyspark.sql import functions as F

    from gigaspark.operators.similarity import (
        int_l2, kmeans_refine, pq_codebooks, quantize)

    m, dim, d = 8, 64, 8
    rng = np.random.default_rng(11)
    emb_df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(120)],
        "vec_id long, embedding array<float>")
    vecs = emb_df.select("vec_id", quantize(F.col("embedding")).alias("v"))
    sub = (vecs.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(F.col("v"), j * d + 1, d).alias("v"))
        for j in range(m)])).alias("e"))
        .select("vec_id", F.col("e.j").alias("j"), F.col("e.v").alias("v")))
    seed = pq_codebooks(emb_df, m, 16, dim) \
        .select("j", "cid", F.col("csub").alias("cvec"))
    trained = kmeans_refine(sub, seed, n_iter=2, by=("j",))

    def qerr(books):
        d_ = (sub.join(F.broadcast(books), "j")
              .select("vec_id", "j",
                      int_l2(F.col("v"), F.col("cvec")).alias("dist"))
              .groupBy("vec_id", "j").agg(F.min("dist").alias("m")))
        return d_.agg(F.sum("m")).collect()[0][0]

    e0, e1 = qerr(seed), qerr(trained)
    assert e1 < e0  # Lloyd strictly improves the md5-sampled seed here


def test_semantic_dedup_drops_coclustered_copies(vecs):
    """SemDeDup: the planted near-copy (vec 100 ≈ vec 0) lands in vec
    0's cluster and is dropped (first-id keep rule); the negation (101)
    is never a near-dup of anything; every vector appears exactly once
    with its cluster id."""
    from gigaspark.operators.similarity import semantic_dedup

    res = {r["vec_id"]: r for r in
           semantic_dedup(vecs, n_centroids=4, threshold=0.98).collect()}
    assert len(res) == 42
    assert res[0]["keep"] is True
    assert res[100]["keep"] is False          # near-copy of a lower id
    assert res[100]["cid"] == res[0]["cid"]   # L2-co-clustered
    assert res[101]["keep"] is True           # negation: cos = -1
    # keep-set is deterministic across recomputation
    again = {r["vec_id"]: r["keep"] for r in
             semantic_dedup(vecs, n_centroids=4, threshold=0.98).collect()}
    assert again == {k: v["keep"] for k, v in res.items()}
