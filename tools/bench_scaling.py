"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver directive the
same job runs at two parallelism levels — local[8] (N) and local[32]
(4N) — on the SAME input; we report throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4, and additionally prove
DETERMINISM: the emitted-schedule hash must be identical at both levels
(SURVEY §4.5 — parallelism-independent output).

The input is the sf orders table exploded ×32 (~1.9M URLs at sf0.1) so
parallel work (canonicalize UDF, hashing, filter chain, robots join,
bloom build, politeness windows) dominates the fixed per-round driver
overhead — the regime a real 100 TB crawl runs in.

Each level runs in its own subprocess (a JVM cannot change master
mid-session).  Results go to BENCH_SCALING.json and BASELINE.md.

Usage: python tools/bench_scaling.py [sf_dir] [replication]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from gigaspark.session import get_spark
from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
seeds = (
    orders.select("o_orderkey", "o_custkey",
                  F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("j"))
    .select(
        F.concat(F.lit("http://host"),
                 ((F.col("o_custkey") * repl + F.col("j")) % 8192).cast("string"),
                 F.lit(".example/p/"), F.col("o_orderkey").cast("string"),
                 F.lit("/"), F.col("j").cast("string")).alias("url"),
        ((F.col("o_orderkey") + F.col("j")) % 1000).alias("added_time_ms"),
        F.lit(True).alias("is_seed"))
    .repartition(2 * cores)
)
fixtures = {
    "url_filters": spark.createDataFrame(
        [(0, "default", 50, 30.0, 64, 100, False, False)],
        "rule_idx int, expression string, priority int, spider_freq_days double,"
        " max_spiders_per_ip int, same_ip_wait_ms long, harvest_links boolean,"
        " force_delete boolean"),
    "robots": spark.createDataFrame(
        [(f"host{h}.example", "*", "disallow", "/private",
          0 if h % 5 else 500) for h in range(8192)],
        "host string, user_agent string, rule_type string, path_prefix string,"
        " crawl_delay_ms long"),
    "link_graph": spark.createDataFrame([], "src_url string, dst_urls array<string>"),
}
t0 = time.time()
sched = CrawlScheduler(spark, fixtures, CrawlConfig(use_bloom=True))
sched.seed(seeds)
n = sched.run_round()
dt = time.time() - t0
em = sched.emitted_df().select("seq", "urlhash48", "scheduled_time_ms")
h = em.selectExpr("bit_xor(xxhash64(seq, urlhash48, scheduled_time_ms)) AS h").collect()[0][0]
print(json.dumps({"cores": cores, "crawl_s": round(dt, 2), "urls": n,
                  "urls_per_sec": round(n / dt, 1), "order_hash": h}))
"""


def run_level(cores: int, sf_dir: str, repl: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir, str(repl)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker cores={cores} failed:\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n = run_level(8, sf_dir, repl)
    n4 = run_level(32, sf_dir, repl)
    eff = round((n4["urls_per_sec"] / n["urls_per_sec"]) / 4, 3)
    res = {
        "sf_dir": sf_dir, "replication": repl,
        "N": n, "4N": n4,
        "scaling_efficiency": eff,
        "deterministic_across_parallelism": n["order_hash"] == n4["order_hash"],
    }
    print(json.dumps(res, indent=2))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
