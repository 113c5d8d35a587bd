"""Redirect golden tests (oracle_sim step 11 — XmlDoc::getRedirUrl /
Msg13 redirect following [U][M], pinned to a deterministic
src_url→dst_url fixture map).

A redirect reply consumes its politeness slot, harvests nothing, takes
no respider path and no quota count; the target enqueues through the
normal canonicalize→filters→robots→seen pipeline with hopcount
UNCHANGED and is_seed inherited.  The Spark CrawlScheduler must match
the pure-Python OracleSim bit-for-bit on the emitted order, metrics,
and seen set — including chains, loops (terminated by the seen set),
redirects into robots-disallowed / force_delete / already-seen targets,
and raw targets that need canonicalization.
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

# (src raw → dst raw); srcs are canonicalized when the fixture is written
REDIRECTS = [
    # chain: seed page → /r/1 → cross-host /r/2 → an existing page
    (canon_url(0, 0), "http://host0.example/r/1"),
    ("http://host0.example/r/1", "http://host2.example/r/2"),
    ("http://host2.example/r/2", canon_url(2, 1)),
    # 2-loop — must terminate via the seen set, not hang
    (canon_url(1, 0), "http://host1.example/r/loop-a"),
    ("http://host1.example/r/loop-a", "http://host1.example/r/loop-b"),
    ("http://host1.example/r/loop-b", "http://host1.example/r/loop-a"),
    # target disallowed by robots (non-h%3==0 hosts disallow /private)
    (canon_url(5, 0), "http://host5.example/private/via-redirect"),
    # target hits the force_delete rule (urlmatch~=killme)
    (canon_url(4, 0), "http://host4.example/killme/via-redirect"),
    # target already seen (another seed)
    (canon_url(6, 0), canon_url(7, 0)),
    # raw target that must canonicalize before dedup/filters
    (canon_url(8, 0), "HTTP://HOST8.EXAMPLE:80/r/nasty#frag"),
]


@pytest.fixture(scope="module")
def redirect_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("redirects")
    gen_all(str(d), SynthParams(n_hosts=16, pages_lo=2, pages_hi=5,
                                mega_hosts=0, n_seed_hosts=10, n_images=40,
                                out_degree_hi=3))
    pq.write_table(pa.table({
        "src_url": pa.array([canonicalize_url(s) for s, _ in REDIRECTS]),
        "dst_url": pa.array([t for _, t in REDIRECTS]),
    }), f"{d}/redirects.parquet")
    return str(d)


def _run_pair(spark, fix_dir: str, **kw):
    sim = OracleSim(fix_dir, **kw)
    sim.seed()
    while sim.rnd < ROUNDS and sim.frontier:
        sim.run_round()
    fixtures = load_fixtures(spark, fix_dir)
    fixtures["redirects"] = spark.read.parquet(f"{fix_dir}/redirects.parquet")
    sched = CrawlScheduler(spark, fixtures, CrawlConfig(**kw))
    sched.seed(spark.read.parquet(f"{fix_dir}/seeds.parquet"))
    for _ in range(sim.rnd):
        sched.run_round()
    return sim, sched


@pytest.fixture(scope="module")
def redirect_run(spark, redirect_dir):
    return _run_pair(spark, redirect_dir)


def _emitted_tuples(sim, sched):
    got = [(r["seq"], r["urlhash48"], r["url"], r["firstip"], r["priority"],
            r["scheduled_time_ms"], r["hopcount"])
           for r in sched.emitted_df().orderBy("seq").collect()]
    want = [(e.seq, e.urlhash48, e.url, e.firstip, e.priority,
             e.scheduled_time_ms, e.hopcount) for e in sim.emitted]
    return got, want


def test_redirect_order_matches_oracle(redirect_run):
    sim, sched = redirect_run
    got, want = _emitted_tuples(sim, sched)
    assert len(got) == len(want), f"emitted {len(got)} vs oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"first divergence at seq={w[0]}: spark={g} oracle={w}"


def test_redirect_metrics_match(redirect_run):
    sim, sched = redirect_run
    keys = ("emitted", "redirected", "accepted", "dup_seen", "tombstoned",
            "robots_denied")
    got = [{k: m.get(k, 0) for k in keys} for m in sched.metrics]
    want = [{k: m.get(k, 0) for k in keys} for m in sim.metrics]
    assert got == want
    assert sum(m["redirected"] for m in want) >= len(REDIRECTS) - 1


def test_seen_set_matches(redirect_run):
    sim, sched = redirect_run
    got = {(r["firstip"], r["urlhash48"]) for r in
           sched.seen.select("firstip", "urlhash48").collect()}
    assert got == set(sim.seen)


def test_chain_and_loop_semantics(redirect_run):
    """The chain is followed hop-by-hop at the ORIGIN's hopcount, and the
    loop's closing hop lands in dup_seen rather than re-entering."""
    sim, _ = redirect_run
    by_url = {}
    for e in sim.emitted:
        by_url.setdefault(e.url, e)
    r1, r2 = "http://host0.example/r/1", "http://host2.example/r/2"
    assert r1 in by_url and r2 in by_url
    assert by_url[r1].hopcount == 0 and by_url[r2].hopcount == 0  # inherited
    assert by_url[r1].seq < by_url[r2].seq  # hop-by-hop, later rounds
    # loop: both nodes fetched exactly once
    la = [e for e in sim.emitted if e.url == "http://host1.example/r/loop-a"]
    lb = [e for e in sim.emitted if e.url == "http://host1.example/r/loop-b"]
    assert len(la) == 1 and len(lb) == 1
    # denied / tombstoned targets never emitted
    emitted_urls = {e.url for e in sim.emitted}
    assert not any("/private/via-redirect" in u for u in emitted_urls)
    assert not any("killme/via-redirect" in u for u in emitted_urls)
    # nasty raw target was canonicalized before entering the frontier
    assert "http://host8.example/r/nasty" in emitted_urls


def test_redirects_with_errors_match_oracle(spark, redirect_dir):
    """Precedence pinned: the err_mod failure signal wins — a failed
    round-trip never observes a redirect; retries can later redirect."""
    sim, sched = _run_pair(spark, redirect_dir, err_mod=3, retry_wait_ms=500)
    got, want = _emitted_tuples(sim, sched)
    assert len(got) == len(want), f"emitted {len(got)} vs oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"first divergence at seq={w[0]}: spark={g} oracle={w}"
    keys = ("emitted", "redirected", "errors", "retried", "accepted")
    assert ([{k: m.get(k, 0) for k in keys} for m in sched.metrics]
            == [{k: m.get(k, 0) for k in keys} for m in sim.metrics])
