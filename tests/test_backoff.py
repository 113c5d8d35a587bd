"""Unchanged-content respider backoff golden test (oracle step 13 —
XmlDoc EDOCUNCHANGED: a re-download whose content matches the stored doc
skips reindexing and stretches the next spider time [U][M]).

Runs the Spark ``CrawlScheduler(respider=True, unchanged_backoff=True)``
and the pure-Python ``OracleSim`` on the same universe and asserts
bit-identical emitted order, plus the doubling property: an unchanged
re-fetch at least doubles the wait that a changed one would get.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gigaspark.operators.frontier import MS_PER_DAY, CrawlConfig, CrawlScheduler
from gigaspark.synth import SynthParams, gen_all
from tests.conftest import load_fixtures
from tests.oracle_sim import OracleSim

ROUNDS = 16
FETCH_MS = 100

# fast respider everywhere so several generations fit in 16 rounds
BACKOFF_FILTERS = [
    (0, "ismedia", -3, 30.0, 1, 0, False, False),
    (1, "isindexed", 60, 1.0e-5, 1, 50, False, False),
    (2, "isseed", 80, 30.0, 1, 150, True, False),
    (3, "default", 55, 30.0, 1, 100, False, False),
]
FREQ_MS = int(1.0e-5 * float(MS_PER_DAY))


@pytest.fixture(scope="module")
def backoff_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("backoff")
    gen_all(str(d), SynthParams(n_hosts=12, pages_lo=2, pages_hi=4, mega_hosts=0,
                                n_seed_hosts=8, n_images=30, out_degree_hi=2))
    cols = list(zip(*BACKOFF_FILTERS))
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
def backoff_run(spark, backoff_dir):
    sim = OracleSim(backoff_dir, respider=True, unchanged_backoff=True,
                    backoff_cap=8)
    sim.seed()
    while sim.rnd < ROUNDS:
        sim.run_round()
    sched = CrawlScheduler(
        spark, load_fixtures(spark, backoff_dir),
        CrawlConfig(respider=True, unchanged_backoff=True, backoff_cap=8))
    sched.seed(spark.read.parquet(f"{backoff_dir}/seeds.parquet"))
    for _ in range(ROUNDS):
        sched.run_round()
    return sim, sched


def test_backoff_order_matches_oracle(backoff_run):
    sim, sched = backoff_run
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


def test_backoff_metrics_match(backoff_run):
    sim, sched = backoff_run
    keys = ("emitted", "respidered", "accepted", "dup_seen")
    got = [{k: m.get(k, 0) for k in keys} for m in sched.metrics]
    want = [{k: m.get(k, 0) for k in keys} for m in sim.metrics]
    assert got == want


def test_unchanged_refetch_waits_longer(backoff_run):
    """Every re-fetch honours its multiplied interval: the wait between
    fetch g and g+1 is ≥ FREQ_MS × backoff(g), where backoff follows the
    pinned ladder (doubles when (hash+gen)%3==0, else resets to 1) —
    and at least one URL actually exercised a doubled interval."""
    _, sched = backoff_run
    by_hash: dict[int, list[int]] = {}
    for r in sched.emitted_df().orderBy("seq").collect():
        by_hash.setdefault(r["urlhash48"], []).append(r["scheduled_time_ms"])
    doubled = 0
    for h, ts in by_hash.items():
        backoff = 1
        for gen, (t1, t2) in enumerate(zip(ts, ts[1:])):
            if gen > 0 and (h + gen) % 3 == 0:
                backoff = min(backoff * 2, 8)
            else:
                backoff = 1
            if backoff > 1:
                doubled += 1
            assert t2 >= t1 + FETCH_MS + FREQ_MS * backoff, \
                f"hash {h} gen {gen}: {t2} < {t1}+{FETCH_MS}+{FREQ_MS}*{backoff}"
    assert doubled > 0, "no unchanged re-fetch ever doubled — signal inert"


def test_adaptive_crawl_delay_law(spark):
    """Exponential growth on trailing failures, cap at <<6, reset on
    success, all-failure host counts every fetch."""
    from gigaspark.operators.robots import adaptive_crawl_delay

    rows = []
    # host 1: ok, err, err      → trailing 2 → 250<<2 = 1000
    for i, ok in enumerate([True, False, False]):
        rows.append((1, i, i, ok))
    # host 2: err x10           → trailing 10 → cap 250<<6 = 16000
    for i in range(10):
        rows.append((2, i, i, False))
    # host 3: err, err, ok      → trailing 0 → 250
    for i, ok in enumerate([False, False, True]):
        rows.append((3, i, i, ok))
    df = spark.createDataFrame(rows, "host long, ts long, event_id long,"
                                     " ok boolean")
    got = {r["host"]: r for r in adaptive_crawl_delay(
        df, order_cols=("ts", "event_id")).collect()}
    assert got[1]["trailing_errors"] == 2
    assert got[1]["next_delay_ms"] == 1000
    assert got[2]["trailing_errors"] == 10
    assert got[2]["next_delay_ms"] == 16000
    assert got[3]["trailing_errors"] == 0
    assert got[3]["next_delay_ms"] == 250
    assert got[2]["n_errors"] == 10 and got[2]["n_fetches"] == 10
