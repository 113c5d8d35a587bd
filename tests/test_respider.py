"""Respider golden test (SURVEY §3.1 respider semantics, VERDICT r1 #2).

Gigablast never retires a URL: every scanSpiderdb pass re-pairs the
SpiderRequest with its latest SpiderReply and re-evaluates the filter row
(now matching isindexed / percentchangedperday predicates) to decide the
next crawl time (``spideredTime + spiderFreq`` [U][H]).  This suite runs
the Spark ``CrawlScheduler(respider=True)`` and the pure-Python
``OracleSim(respider=True)`` on the same universe with adaptive-interval
rules and asserts bit-identical emitted order, plus the W4 property that
every re-fetch honours the change-rate-assigned interval.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gigaspark.operators.frontier import MS_PER_DAY, CrawlConfig, CrawlScheduler
from gigaspark.synth import SynthParams, gen_all
from tests.conftest import load_fixtures
from tests.oracle_sim import OracleSim

ROUNDS = 14
FETCH_MS = 100

# adaptive respider rules: hotter pages (higher percentchangedperday from
# the latest reply) get a shorter spider_freq_days — the W4 feedback loop
RESPIDER_FILTERS = [
    (0, "ismedia", -3, 30.0, 1, 0, False, False),
    (1, "isindexed && percentchangedperday>=60", 72, 3.0e-6, 1, 50, False, False),
    (2, "isindexed && percentchangedperday>=25", 64, 8.0e-6, 1, 50, False, False),
    (3, "isindexed", 58, 2.0e-5, 1, 50, False, False),
    (4, "isseed", 80, 30.0, 1, 150, True, False),
    (5, "hopcount>=3", 35, 30.0, 1, 100, False, False),
    (6, "default", 55, 30.0, 1, 100, True, False),
]


def freq_ms_for(pct: int) -> int:
    days = 3.0e-6 if pct >= 60 else 8.0e-6 if pct >= 25 else 2.0e-5
    return int(days * float(MS_PER_DAY))


@pytest.fixture(scope="module")
def respider_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("respider")
    gen_all(str(d), SynthParams(n_hosts=16, pages_lo=2, pages_hi=5, mega_hosts=0,
                                n_seed_hosts=10, n_images=40, out_degree_hi=3))
    cols = list(zip(*RESPIDER_FILTERS))
    pq.write_table(pa.table({
        "rule_idx": pa.array(cols[0], pa.int32()),
        "expression": pa.array(cols[1], pa.string()),
        "priority": pa.array(cols[2], pa.int32()),
        "spider_freq_days": pa.array(cols[3], pa.float64()),
        "max_spiders_per_ip": pa.array(cols[4], pa.int32()),
        "same_ip_wait_ms": pa.array(cols[5], pa.int64()),
        "harvest_links": pa.array(cols[6], pa.bool_()),
        "force_delete": pa.array(cols[7], pa.bool_()),
    }), f"{d}/url_filters.parquet")
    return str(d)


@pytest.fixture(scope="module")
def respider_run(spark, respider_dir):
    sim = OracleSim(respider_dir, respider=True)
    sim.seed()
    while sim.rnd < ROUNDS:
        sim.run_round()
    sched = CrawlScheduler(spark, load_fixtures(spark, respider_dir),
                           CrawlConfig(respider=True))
    sched.seed(spark.read.parquet(f"{respider_dir}/seeds.parquet"))
    for _ in range(ROUNDS):
        sched.run_round()
    return sim, sched


def test_respider_order_matches_oracle(respider_run):
    sim, sched = respider_run
    got = [
        (r["seq"], r["urlhash48"], r["url"], r["firstip"], r["priority"],
         r["scheduled_time_ms"], r["hopcount"])
        for r in sched.emitted_df().orderBy("seq").collect()
    ]
    want = [
        (e.seq, e.urlhash48, e.url, e.firstip, e.priority,
         e.scheduled_time_ms, e.hopcount)
        for e in sim.emitted
    ]
    assert len(got) == len(want), f"emitted {len(got)} vs oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"first divergence at seq={w[0]}: spark={g} oracle={w}"


def test_urls_refetched_on_schedule(respider_run):
    """At least one URL is fetched twice, and EVERY re-fetch waits out the
    interval its change-rate bucket assigned: t2 ≥ (t1 + fetch) + freq_ms."""
    _, sched = respider_run
    by_hash: dict[int, list[int]] = {}
    for r in sched.emitted_df().orderBy("seq").collect():
        by_hash.setdefault(r["urlhash48"], []).append(r["scheduled_time_ms"])
    refetched = {h: ts for h, ts in by_hash.items() if len(ts) > 1}
    assert refetched, "no URL was ever re-spidered — respider loop inert"
    for h, ts in refetched.items():
        freq = freq_ms_for(h % 101)
        for t1, t2 in zip(ts, ts[1:]):
            assert t2 >= t1 + FETCH_MS + freq, \
                f"hash {h}: refetch at {t2} violates due {t1}+{FETCH_MS}+{freq}"


def test_respider_metrics_match(respider_run):
    sim, sched = respider_run
    keys = ("emitted", "respidered", "accepted", "dup_seen")
    got = [{k: m.get(k, 0) for k in keys} for m in sched.metrics]
    want = [{k: m.get(k, 0) for k in keys} for m in sim.metrics]
    assert got == want


def test_seen_set_unchanged_by_respider(respider_run):
    """Re-entries must not grow the URL-seen set (key already present)."""
    sim, sched = respider_run
    got = {(r["firstip"], r["urlhash48"]) for r in
           sched.seen.select("firstip", "urlhash48").collect()}
    assert got == set(sim.seen)
