"""Content-dedup golden tests (oracle_sim step 12 — XmlDoc's EDOCDUP
content-hash check at index time / getIsDup dup-docid lookup [U][M],
pinned to a deterministic url→content_hash fixture map).

A dup reply consumes its politeness slot, harvests nothing, takes no
respider path and no quota count; the FIRST fetch of each content hash
(in global emission order) indexes and owns the hash, and a respider
re-fetch by the owner itself is NOT a dup (cross-docid only).
Precedence: error > redirect > dup.  The Spark CrawlScheduler must
match the pure-Python OracleSim bit-for-bit on emitted order, metrics,
and seen set — including within-round dup pairs (cross-host, same
round), cross-round dup pairs (seed vs harvested outlink), error and
redirect interplay, and checkpoint/resume of the indexed-hash registry.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gigaspark.functions.urls import canonicalize_url
from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler
from gigaspark.synth import SynthParams, canon_url, gen_all
from tests.conftest import load_fixtures
from tests.oracle_sim import OracleSim

ROUNDS = 12

# url → content_hash; everything unmapped hashes to its own urlhash48.
# Heavy sharing across hosts and page depths so dups land both within a
# round (different hosts, same round) and across rounds (seed page 0 in
# round 0 vs harvested pages in later rounds).
CONTENT_MAP = [(canon_url(h, p), 9000 + (h * 3 + p) % 5)
               for h in range(12) for p in range(3)]

# one dup-pair member is ALSO a redirect src: the redirect reply wins
# and never indexes, so its content-hash partner indexes instead
REDIRECTS = [(canon_url(3, 0), "http://host3.example/r/via-dedup")]


@pytest.fixture(scope="module")
def dedup_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("content_dedup")
    gen_all(str(d), SynthParams(n_hosts=16, pages_lo=2, pages_hi=5,
                                mega_hosts=0, n_seed_hosts=10, n_images=40,
                                out_degree_hi=3))
    pq.write_table(pa.table({
        "url": pa.array([canonicalize_url(u) for u, _ in CONTENT_MAP]),
        "content_hash": pa.array([c for _, c in CONTENT_MAP], pa.int64()),
    }), f"{d}/content_map.parquet")
    pq.write_table(pa.table({
        "src_url": pa.array([canonicalize_url(s) for s, _ in REDIRECTS]),
        "dst_url": pa.array([t for _, t in REDIRECTS]),
    }), f"{d}/redirects.parquet")
    return str(d)


def _run_pair(spark, fix_dir: str, rounds: int = ROUNDS, **kw):
    sim = OracleSim(fix_dir, **kw)
    sim.seed()
    while sim.rnd < rounds and sim.frontier:
        sim.run_round()
    fixtures = load_fixtures(spark, fix_dir)
    fixtures["redirects"] = spark.read.parquet(f"{fix_dir}/redirects.parquet")
    fixtures["content_map"] = spark.read.parquet(f"{fix_dir}/content_map.parquet")
    sched = CrawlScheduler(spark, fixtures, CrawlConfig(**kw))
    sched.seed(spark.read.parquet(f"{fix_dir}/seeds.parquet"))
    for _ in range(sim.rnd):
        sched.run_round()
    return sim, sched


@pytest.fixture(scope="module")
def dedup_run(spark, dedup_dir):
    return _run_pair(spark, dedup_dir)


def _emitted_tuples(sim, sched):
    got = [(r["seq"], r["urlhash48"], r["url"], r["firstip"], r["priority"],
            r["scheduled_time_ms"], r["hopcount"])
           for r in sched.emitted_df().orderBy("seq").collect()]
    want = [(e.seq, e.urlhash48, e.url, e.firstip, e.priority,
             e.scheduled_time_ms, e.hopcount) for e in sim.emitted]
    return got, want


def _assert_golden(sim, sched):
    got, want = _emitted_tuples(sim, sched)
    assert len(got) == len(want), f"emitted {len(got)} vs oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"first divergence at seq={w[0]}: spark={g} oracle={w}"


def test_dedup_order_matches_oracle(dedup_run):
    sim, sched = dedup_run
    _assert_golden(sim, sched)


def test_dedup_metrics_match(dedup_run):
    sim, sched = dedup_run
    keys = ("emitted", "dups", "redirected", "accepted", "dup_seen")
    got = [{k: m.get(k, 0) for k in keys} for m in sched.metrics]
    want = [{k: m.get(k, 0) for k in keys} for m in sim.metrics]
    assert got == want
    assert sum(m["dups"] for m in want) > 0, "fixture planted no dups"


def test_indexed_registry_matches(dedup_run):
    """Spark's indexed_ch registry equals the sim's hash→owner dict, and
    every mapped hash has exactly ONE owner (first-indexer-wins)."""
    sim, sched = dedup_run
    got = {(r["content_hash"], r["owner"]) for r in
           sched.indexed_ch.collect()}
    assert got == {(ch, owner) for ch, owner in sim.indexed_ch.items()}
    hashes = [ch for ch, _ in got]
    assert len(hashes) == len(set(hashes))


def test_seen_set_matches(dedup_run):
    sim, sched = dedup_run
    got = {(r["firstip"], r["urlhash48"]) for r in
           sched.seen.select("firstip", "urlhash48").collect()}
    assert got == set(sim.seen)


def test_dedup_with_errors_match_oracle(spark, dedup_dir):
    """Error precedence pinned: a failed round-trip never observes
    content — it neither indexes nor counts as a dup, and its retry can
    later index (or dup) normally."""
    sim, sched = _run_pair(spark, dedup_dir, err_mod=3, retry_wait_ms=500)
    _assert_golden(sim, sched)
    keys = ("emitted", "dups", "errors", "retried", "redirected")
    assert ([{k: m.get(k, 0) for k in keys} for m in sched.metrics]
            == [{k: m.get(k, 0) for k in keys} for m in sim.metrics])


def test_owner_refetch_not_self_dup(spark, dedup_dir):
    """Respider mode: the owner's re-fetch of its own content hash is not
    a dup (cross-docid only) — some URL is emitted at least twice while
    the engines stay bit-identical."""
    sim, sched = _run_pair(spark, dedup_dir, rounds=8, respider=True)
    _assert_golden(sim, sched)
    by_url: dict[str, int] = {}
    for e in sim.emitted:
        by_url[e.url] = by_url.get(e.url, 0) + 1
    assert max(by_url.values()) >= 2, "no respider re-fetch in window"


def test_resume_preserves_indexed_registry(spark, dedup_dir, tmp_path):
    """ST4 × step 12: checkpoint mid-crawl, resume, and finish — emitted
    order, metrics, and the indexed-hash registry all equal the
    uninterrupted run's."""
    sim, _ = _run_pair(spark, dedup_dir)
    fixtures = load_fixtures(spark, dedup_dir)
    fixtures["redirects"] = spark.read.parquet(f"{dedup_dir}/redirects.parquet")
    fixtures["content_map"] = spark.read.parquet(f"{dedup_dir}/content_map.parquet")
    state = str(tmp_path / "state")
    a = CrawlScheduler(spark, fixtures, CrawlConfig(), state_dir=state)
    a.seed(spark.read.parquet(f"{dedup_dir}/seeds.parquet"))
    for _ in range(4):
        a.run_round()
    a.checkpoint()
    b = CrawlScheduler.resume(spark, fixtures, state, CrawlConfig())
    for _ in range(sim.rnd - 4):
        b.run_round()
    _assert_golden(sim, b)
    got = {(r["content_hash"], r["owner"]) for r in b.indexed_ch.collect()}
    assert got == {(ch, owner) for ch, owner in sim.indexed_ch.items()}
