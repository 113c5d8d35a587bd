"""The whole engine, one pipeline: crawl → fetch → index → search.

A reference user's workflow end-to-end — the scheduler drains the
frontier in golden order, each fetched URL joins its image+caption
payload (validated), the captions build the posting lists, and a
Query.cpp-style query string retrieves over them — cross-checked
against a brute-force evaluation of the same fetched corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from gigaspark.functions.urls import host_col
from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler
from gigaspark.operators.query_lang import compile_query, parse_query
from gigaspark.operators.search import build_postings
from tests.conftest import load_fixtures


def _brute(corpus, q, k=10):
    """corpus: {doc_id: (text, site)}; same pinned semantics as
    tests/test_query_lang.py's oracle, trimmed to terms/phrases/site."""
    pq = parse_query(q)

    def atom_score(a, words):
        if a.kind == "term":
            scope = words if a.max_pos is None else words[:a.max_pos + 1]
            return sum(1 for w in scope if w == a.words[0])
        n = len(a.words)
        return sum(1 for i in range(len(words) - n + 1)
                   if tuple(words[i:i + n]) == a.words)

    out = []
    for did, (text, site) in corpus.items():
        words = text.lower().split()
        inc, exc = pq.field_in("site"), pq.field_not_in("site")
        if inc and site not in inc:
            continue
        if site in exc:
            continue
        if any(atom_score(a, words) for a in pq.excludes):
            continue
        score, matched = 0, 0
        for unit in pq.units:
            s = sum(atom_score(a, words) for a in unit)
            if s:
                matched += 1
                score += s
        if matched == len(pq.units):
            out.append((did, score))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_crawl_index_search(spark, micro_dir):
    fx = load_fixtures(spark, micro_dir)
    sched = CrawlScheduler(spark, fx, CrawlConfig(validate_fetch=True))
    sched.seed(spark.read.parquet(f"{micro_dir}/seeds.parquet"))
    for _ in range(3):
        sched.run_round()

    fetched = sched.fetched_df().where(F.col("caption").isNotNull())
    # the fetch invariant held for everything we're about to index
    bad = fetched.where(~F.col("pixels_ok") | ~F.col("caption_ok")).count()
    assert bad == 0

    docs = fetched.select(F.col("urlhash48").alias("doc_id"),
                          F.col("caption").alias("text"),
                          host_col(F.col("url")).alias("site"))
    postings = build_postings(docs)
    dim = docs.select("doc_id", "site", F.lit("en").alias("lang"))

    corpus = {r["doc_id"]: (r["text"], r["site"]) for r in docs.collect()}
    assert len(corpus) > 10

    # pick a site that actually hosts payloads, deterministically
    some_site = min(s for _, s in corpus.values())

    queries = [
        '"caption of" otter OR harbor',
        "otter -amber",
        f'caption site:{some_site}',
        'intitle:caption harbor',
    ]
    for q in queries:
        got = [(r["doc_id"], r["score"])
               for r in compile_query(postings, dim, q, k=10).collect()]
        assert got == _brute(corpus, q, k=10), f"mismatch for {q!r}"
    # at least one query returned rows (the universe contains otters)
    assert _brute(corpus, '"caption of" otter OR harbor')


def test_crawl_filter_pack_images(spark, micro_dir):
    """The image-payload pipeline end to end: crawl → validated fetch →
    corpus filter over the fetched images' metadata → webdataset shard
    assignment.  Every fetched-and-kept image is packed exactly once on
    a contiguous byte stream."""
    from gigaspark.operators.image_pipeline import (image_corpus_filter,
                                                    image_shard_pack)
    from tests.conftest import load_fixtures as _lf

    fx = _lf(spark, micro_dir)
    sched = CrawlScheduler(spark, fx, CrawlConfig(validate_fetch=True))
    sched.seed(spark.read.parquet(f"{micro_dir}/seeds.parquet"))
    for _ in range(3):
        sched.run_round()

    fetched = sched.fetched_df().where(F.col("image_id").isNotNull())
    assert fetched.where(~F.col("pixels_ok") | ~F.col("caption_ok")).count() == 0

    imgs = (fetched.select("image_id").distinct()
            .join(spark.read.parquet(f"{micro_dir}/images.parquet"),
                  "image_id"))
    n_imgs = imgs.count()
    assert n_imgs > 10

    dec = image_corpus_filter(imgs)
    assert dec.count() == n_imgs
    # synth dims are 32..128 and captions are 5-6 tokens: only the
    # duplicate rule can drop anything here
    assert dec.where("too_small or bad_aspect or bad_caption").count() == 0

    kept = dec.where("keep")
    nb = F.col("w").cast("long") * F.col("h").cast("long") * 3 + 64
    packed = image_shard_pack(kept, shard_bytes=1 << 16, nbytes=nb)
    rows = packed.orderBy("start_off").collect()
    assert len(rows) == kept.count()
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_off"] == prev["start_off"] + prev["nbytes"]
    # the kept stream crosses at least one shard boundary at this scale
    assert len({r["shard_id"] for r in rows}) >= 2
