"""Content-driven respider rate (VERDICT r2 item 10 — SpiderReply::
m_percentChangedPerDay semantics [U][M]).

With a per-generation content fixture (``content_gens``: url, gen,
content_hash) the respider change signals stop being pinned urlhash
arithmetic and become content-derived:

  * unchanged at gen g>0  ⟺  hash(url, g) == hash(url, g−1);
  * percentchangedperday = 0 when unchanged or first download, else
    min(100, 100·MS_PER_DAY DIV elapsed_ms) — the integer change rate
    since the previous fetch.

The golden property: a CHURNING page's re-spider interval tightens to
the fast rule while a STABLE page's interval doubles under the
EDOCUNCHANGED backoff — and the Spark scheduler matches the pure-Python
oracle bit-for-bit on the whole schedule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gigaspark.operators.frontier import MS_PER_DAY, CrawlConfig, CrawlScheduler
from tests.oracle_sim import OracleSim

ROUNDS = 12
FETCH_MS = 100
HOST = "churn.example"
URL_HOT = f"http://{HOST}/hot"       # content changes every generation
URL_COLD = f"http://{HOST}/cold"     # content never changes

# pct-adaptive rules: a changing page (pct >= 40) re-spiders at 0.5 days,
# everything indexed-but-stale at 2 days, discovery at priority default
FILTERS = [
    (0, "isindexed && percentchangedperday>=40", 72, 0.5, 2, 50, False, False),
    (1, "isindexed", 58, 2.0, 2, 50, False, False),
    (2, "default", 50, 30.0, 2, 50, False, False),
]


@pytest.fixture(scope="module")
def churn_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("churn"))
    pq.write_table(pa.table({
        "url": pa.array([URL_HOT, URL_COLD], pa.string()),
        "added_time_ms": pa.array([0, 1], pa.int64()),
        "is_seed": pa.array([True, True], pa.bool_()),
    }), f"{d}/seeds.parquet")
    pq.write_table(pa.table({
        "src_url": pa.array([], pa.string()),
        "dst_urls": pa.array([], pa.list_(pa.string())),
    }), f"{d}/link_graph.parquet")
    pq.write_table(pa.table({
        "host": pa.array([], pa.string()),
        "user_agent": pa.array([], pa.string()),
        "rule_type": pa.array([], pa.string()),
        "path_prefix": pa.array([], pa.string()),
        "crawl_delay_ms": pa.array([], pa.int64()),
    }), f"{d}/robots.parquet")
    cols = list(zip(*FILTERS))
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
    # hot page: fresh hash every generation; cold page: absent → its
    # hash defaults to urlhash48 at every gen (stable by construction)
    gens = list(range(ROUNDS + 2))
    pq.write_table(pa.table({
        "url": pa.array([URL_HOT] * len(gens), pa.string()),
        "gen": pa.array(gens, pa.int32()),
        "content_hash": pa.array([1000 + g for g in gens], pa.int64()),
    }), f"{d}/content_gens.parquet")
    return d


def _fixtures(spark, d):
    fx = {
        "url_filters": spark.read.parquet(f"{d}/url_filters.parquet"),
        "robots": spark.read.parquet(f"{d}/robots.parquet"),
        "link_graph": spark.read.parquet(f"{d}/link_graph.parquet"),
        "content_gens": spark.read.parquet(f"{d}/content_gens.parquet"),
    }
    return fx


@pytest.fixture(scope="module")
def churn_run(spark, churn_dir):
    sim = OracleSim(churn_dir, respider=True, unchanged_backoff=True)
    sim.seed()
    while sim.rnd < ROUNDS:
        sim.run_round()
    sched = CrawlScheduler(spark, _fixtures(spark, churn_dir),
                           CrawlConfig(respider=True, unchanged_backoff=True))
    sched.seed(spark.read.parquet(f"{churn_dir}/seeds.parquet"))
    for _ in range(ROUNDS):
        sched.run_round()
    return sim, sched


def test_changerate_order_matches_oracle(churn_run):
    sim, sched = churn_run
    got = [(r["urlhash48"], r["scheduled_time_ms"]) for r in
           sched.emitted_df().orderBy("seq")
           .select("urlhash48", "scheduled_time_ms").collect()]
    want = [(e.urlhash48, e.scheduled_time_ms) for e in sim.emitted]
    assert len(got) > 6
    assert got == want


def test_interval_tracks_content_churn(churn_run):
    sim, _ = churn_run
    by_url: dict[str, list[int]] = {}
    for e in sim.emitted:
        by_url.setdefault(e.url, []).append(e.scheduled_time_ms)
    hot = by_url[URL_HOT]
    cold = by_url[URL_COLD]
    assert len(hot) >= 4 and len(cold) >= 3
    hot_gaps = [b - a for a, b in zip(hot, hot[1:])]
    cold_gaps = [b - a for a, b in zip(cold, cold[1:])]
    # first re-spider of BOTH pages uses the slow rule (first download
    # has pct=0), ≈ 2 days
    assert abs(hot_gaps[0] - 2 * MS_PER_DAY) < MS_PER_DAY // 4
    # the hot page's change rate (100·1d/2d = 50 ≥ 40) promotes it to
    # the 0.5-day rule from the second re-spider on
    for g in hot_gaps[1:]:
        assert abs(g - MS_PER_DAY // 2) < MS_PER_DAY // 8, hot_gaps
    # the cold page stays on the slow rule AND backs off: gaps double
    for a, b in zip(cold_gaps, cold_gaps[1:]):
        assert b > a * 1.8, cold_gaps
