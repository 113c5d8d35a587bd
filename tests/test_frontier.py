"""Golden crawl-order end-to-end test (SURVEY §5.2.1 — the qa.cpp analogue).

Runs the pure-Python oracle simulator (the executable spec for Gigablast's
``SpiderLoop``/``populateDoledbFromWaitingTree`` semantics [U][H]) and the
Spark ``CrawlScheduler`` on the SAME synthesized universe and asserts:

  * emitted crawl order matches EXACTLY, seq by seq (north_rule contract);
  * the URL-seen set matches exactly (firstip, urlhash48, min_hopcount);
  * politeness invariant: consecutive fetches on one firstip are separated
    by >= fetch_ms + max(same_ip_wait, crawl_delay) (§5.2.5 property);
  * at most max_spiders_per_ip in flight per (round, firstip);
  * no URL emitted twice;
  * per-round metrics (accepted/dup_seen/filtered/robots_denied) agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler
from tests.conftest import load_fixtures
from tests.oracle_sim import OracleSim

MAX_ROUNDS = 200


@pytest.fixture(scope="module")
def micro_run(spark, micro_dir):
    sim = OracleSim(micro_dir)
    sim_res = sim.run(max_rounds=MAX_ROUNDS)
    sched = CrawlScheduler(spark, load_fixtures(spark, micro_dir))
    sched.run(max_rounds=MAX_ROUNDS, seeds=spark.read.parquet(f"{micro_dir}/seeds.parquet"))
    return sim, sim_res, sched


def test_emitted_order_matches_oracle(micro_run):
    _, sim_res, sched = micro_run
    got = [
        (r["seq"], r["urlhash48"], r["url"], r["firstip"], r["priority"],
         r["scheduled_time_ms"], r["hopcount"])
        for r in sched.emitted_df().orderBy("seq").collect()
    ]
    want = [
        (e.seq, e.urlhash48, e.url, e.firstip, e.priority,
         e.scheduled_time_ms, e.hopcount)
        for e in sim_res.emitted
    ]
    assert len(got) == len(want), f"emitted {len(got)} vs oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"first divergence at seq={w[0]}: spark={g} oracle={w}"


def test_url_seen_matches_oracle(micro_run):
    _, sim_res, sched = micro_run
    got = {
        (r["firstip"], r["urlhash48"]): (r["min_hopcount"], r["round_enqueued"])
        for r in sched.seen.collect()
    }
    assert got == sim_res.seen


def test_politeness_gaps(micro_run, spark, micro_dir):
    _, _, sched = micro_run
    em = sched.emitted_df()
    delays = sched.host_delays
    w = F.expr(
        "lag(scheduled_time_ms) over (partition by firstip order by scheduled_time_ms)")
    gaps = (
        em.join(delays, "host", "left")
        .withColumn("prev_ms", w)
        .where(F.col("prev_ms").isNotNull())
        .withColumn("gap", F.col("scheduled_time_ms") - F.col("prev_ms"))
        .withColumn("min_gap",
                    F.lit(sched.cfg.fetch_ms) + F.coalesce("crawl_delay_ms", F.lit(0)))
    )
    bad = gaps.where(F.col("gap") < F.col("min_gap")).count()
    assert bad == 0


def test_no_duplicate_emission(micro_run):
    _, _, sched = micro_run
    em = sched.emitted_df()
    assert em.count() == em.select("firstip", "urlhash48").distinct().count()


def test_metrics_match_oracle(micro_run):
    _, sim_res, sched = micro_run
    keys = ("emitted", "accepted", "dup_seen", "filtered", "robots_denied", "tombstoned")
    got = [{k: m.get(k, 0) for k in keys} for m in sched.metrics]
    want = [{k: m.get(k, 0) for k in keys} for m in sim_res.metrics]
    assert got == want


def test_tiny_universe_order(spark, tiny_dir):
    """Larger universe incl. megahost skew — full golden-order equality."""
    sim_res = OracleSim(tiny_dir).run(max_rounds=MAX_ROUNDS)
    sched = CrawlScheduler(spark, load_fixtures(spark, tiny_dir))
    sched.run(max_rounds=MAX_ROUNDS,
              seeds=spark.read.parquet(f"{tiny_dir}/seeds.parquet"))
    got = [(r["seq"], r["urlhash48"]) for r in
           sched.emitted_df().select("seq", "urlhash48").orderBy("seq").collect()]
    want = [(e.seq, e.urlhash48) for e in sim_res.emitted]
    assert got == want
    got_seen = {(r["firstip"], r["urlhash48"]) for r in
                sched.seen.select("firstip", "urlhash48").collect()}
    assert got_seen == set(sim_res.seen)


def test_narrow_window_plan_equivalence(spark, micro_dir, monkeypatch):
    """VERDICT r4 item 3: the narrow-key winner window (the big-frontier
    plan, normally gated on NARROW_WINDOW_MIN_ROWS=2M pending rows) must
    emit the IDENTICAL (seq, urlhash48) schedule as the default
    full-width window.  Forcing the threshold to 0 makes every round
    take the narrow path on the golden micro-universe; run at two
    parallelism levels via shuffle-partition override to also pin
    layout-independence."""
    import gigaspark.operators.frontier as fr

    def run_schedule():
        sched = CrawlScheduler(spark, load_fixtures(spark, micro_dir))
        sched.run(max_rounds=MAX_ROUNDS,
                  seeds=spark.read.parquet(f"{micro_dir}/seeds.parquet"))
        return [(r["seq"], r["urlhash48"])
                for r in sched.emitted_df().orderBy("seq").collect()]

    default_order = run_schedule()
    monkeypatch.setattr(fr, "NARROW_WINDOW_MIN_ROWS", 0)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        narrow_order = run_schedule()
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow_order_p3 = run_schedule()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow_order == default_order
    assert narrow_order_p3 == default_order
