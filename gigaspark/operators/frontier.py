"""The crawl-frontier scheduler — Spark re-expression of Gigablast's
spider loop (SURVEY §3.1: ``SpiderLoop::spiderDoledUrls`` +
``SpiderColl::populateDoledbFromWaitingTree`` [U][H]).

Semantics are PINNED by tests/oracle_sim.py (the executable spec); this
module must reproduce its emitted crawl order and URL-seen set exactly.
Each virtual-clock round is a pure DataFrame program:

    eligible = frontier ⟕ host_state            (waiting-tree analogue)
    winners  = top-k per firstip by (priority desc, added, hop, hash)
               — the Doledb A1 drain, a row_number window
    slots    = cumulative politeness gaps within host (window sum)
    emit     → ordered schedule (golden-order contract, W1)
    fetch    → simulated via page_image/images join (S4) + PSNR/caption
               validation (J8) when payload tables are provided
    outlinks → canonicalize → hash → filters → robots → bloom+anti-join
               dedup (F5/J5/§2.7) → frontier append
    host_state ← next_ok = last slot end + max(wait, crawl_delay) (A2)

Determinism (SURVEY §4.5): no wall-clock, no randomness; every ordering
has a total tie-break ending in urlhash48; the final seq is assigned by
one explicit global sort — identical output at local[8] and local[32].

Scale notes (10^10-URL design): frontier/seen are key-partitioned by
urlhash48 (uniform by construction — xxhash64); the only per-host
ordering shuffle is the winner window, whose partition key firstip is
protected from megahost skew because a host contributes at most its
pending set and AQE skew-split handles residue (two-level tournament in
operators/skew.py is the explicit fallback).  State snapshots commit
through io/tableio.StateStore (Iceberg-emulating manifest) → exact
resume (ST4).  Per-round driver work is O(1) scalar aggregates only —
no ``collect()`` of data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from gigaspark.io.tableio import StateStore
from gigaspark.operators import robots as robots_op
from gigaspark.operators import urlseen
from gigaspark.operators.url_filters import ASSIGN_FIELDS, Rule, apply_url_filters, rules_from_rows
from gigaspark.functions.urls import with_url_columns

FETCH_MS = 100

ENQUEUE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("added_ms", T.LongType()),
    T.StructField("hopcount", T.IntegerType()),
    T.StructField("is_seed", T.BooleanType()),
])

EMIT_COLS = ["round", "scheduled_time_ms", "priority", "added_ms", "urlhash48",
             "url", "firstip", "hopcount", "host"]

def _win_order():
    # building Columns needs an active SparkContext → lazy, not module-level
    return [F.col("priority").desc(), F.col("added_ms").asc(),
            F.col("hopcount").asc(), F.col("urlhash48").asc()]


@dataclass
class CrawlConfig:
    fetch_ms: int = FETCH_MS
    use_bloom: bool = True
    bloom: urlseen.BloomParams = field(default_factory=urlseen.BloomParams)
    checkpoint_every: int = 0        # 0 → only on explicit .checkpoint()
    validate_fetch: bool = False     # needs page_image/images/images_golden
    tournament_salts: int = 0        # >1 → §4.4 two-level skew tournament


class CrawlScheduler:
    """Iterative-batch spider loop over DataFrames (ST1 batch mode)."""

    def __init__(self, spark: SparkSession, fixtures: dict[str, DataFrame],
                 config: CrawlConfig | None = None, state_dir: str | None = None):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.rules: list[Rule] = rules_from_rows(fixtures["url_filters"].collect())
        self.k_max = max(1, *(r.max_spiders_per_ip for r in self.rules))
        self.robots_rules = robots_op.prep_rules(fixtures["robots"]).cache()
        self.host_delays = robots_op.host_delays(self.robots_rules).cache()
        # link graph exploded once: (src_url, dst_url)
        self.links = (
            fixtures["link_graph"]
            .select(F.col("src_url"), F.explode("dst_urls").alias("dst_url"))
        ).persist()
        self.page_image = fixtures.get("page_image")
        self.images = fixtures.get("images")
        self.images_golden = fixtures.get("images_golden")
        self.store = StateStore(state_dir) if state_dir else None

        empty = spark.createDataFrame([], self._frontier_schema())
        self.frontier = empty
        self.seen = spark.createDataFrame(
            [], "firstip int, urlhash48 long, min_hopcount int, round_enqueued int")
        self.host_state = spark.createDataFrame([], "firstip int, next_ok_ms long")
        self.segments = None  # bloom segments DF (lazy-init on first enqueue)
        self.n_seen = 0       # driver-side seen-count (fast-path guard)
        self.emitted_parts: list[DataFrame] = []
        self.fetched_parts: list[DataFrame] = []
        self.metrics: list[dict] = []
        self.clock_ms = 0
        self.round = 0

    @staticmethod
    def _frontier_schema() -> T.StructType:
        return T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("firstip", T.IntegerType()),
            T.StructField("urlhash48", T.LongType()),
            T.StructField("hopcount", T.IntegerType()),
            T.StructField("added_ms", T.LongType()),
            T.StructField("is_seed", T.BooleanType()),
            T.StructField("ufn", T.IntegerType()),
            T.StructField("priority", T.IntegerType()),
            T.StructField("spider_freq_days", T.DoubleType()),
            T.StructField("max_spiders_per_ip", T.IntegerType()),
            T.StructField("same_ip_wait_ms", T.LongType()),
            T.StructField("harvest_links", T.BooleanType()),
            T.StructField("force_delete", T.BooleanType()),
        ])

    # ------------------------------------------------------------------ #
    # enqueue — oracle_sim step 6                                         #
    # ------------------------------------------------------------------ #
    def enqueue(self, raw: DataFrame) -> dict:
        """raw: (url, added_ms, hopcount, is_seed) — raw (uncanonical) URLs."""
        from gigaspark.functions.urls import firstip_col, host_col, path_col, urlhash48_col

        df = with_url_columns(raw, "url")
        # batch dedup on key: min hop / min added / min url / any is_seed
        df = (
            df.groupBy("firstip", "urlhash48")
            .agg(F.min("url").alias("url"),
                 F.min("hopcount").alias("hopcount"),
                 F.min("added_ms").alias("added_ms"),
                 F.max("is_seed").alias("is_seed"))
        )
        # re-derive host/path from the kept (already-canonical) min url —
        # pure built-ins, no second canonicalize pass
        df = (
            df.withColumn("host", host_col(F.col("url")))
            .withColumn("path", path_col(F.col("url")))
        )
        df = df.withColumn("errorcount", F.lit(0))
        df = apply_url_filters(df, self.rules)
        df = robots_op.eval_allowed(df, self.robots_rules)
        df = df.withColumn(
            "_disposition",
            F.when(F.col("force_delete"), "tombstoned")
            .when(F.col("priority") < 0, "filtered")
            .when(~F.col("robots_allowed"), "robots_denied")
            .otherwise("pass"),
        )
        annotated = df.localCheckpoint(eager=True)
        passing = annotated.where(F.col("_disposition") == "pass")
        if self.n_seen == 0:
            # seeding fast path: nothing seen yet → every passing key is new
            # (batch itself is already key-deduped by the groupBy above)
            new = passing.localCheckpoint(eager=True)
        else:
            new = urlseen.filter_new(
                passing, self.seen.select("firstip", "urlhash48"),
                self.segments if self.cfg.use_bloom else None, self.cfg.bloom,
            ).localCheckpoint(eager=True)

        counts = {r["_disposition"]: r["n"] for r in
                  annotated.groupBy("_disposition").agg(F.count("*").alias("n")).collect()}
        n_pass = counts.get("pass", 0)
        n_new = new.count()
        m = {"deduped": sum(counts.values()), "filtered": counts.get("filtered", 0),
             "tombstoned": counts.get("tombstoned", 0),
             "robots_denied": counts.get("robots_denied", 0),
             "dup_seen": n_pass - n_new, "accepted": n_new}
        if n_new == 0:
            return m
        self.n_seen += n_new

        new_front = new.select(*[f.name for f in self._frontier_schema().fields])
        self.frontier = self.frontier.unionByName(new_front).localCheckpoint(eager=True)
        new_keys = new.select("firstip", "urlhash48",
                              F.col("hopcount").alias("min_hopcount"),
                              F.lit(self.round).alias("round_enqueued"))
        self.seen = self.seen.unionByName(new_keys).localCheckpoint(eager=True)
        if self.cfg.use_bloom:
            add = urlseen.build_segments(new_keys, self.cfg.bloom)
            self.segments = (
                add if self.segments is None
                else urlseen.merge_segments(self.segments, add, self.cfg.bloom)
            ).localCheckpoint(eager=True)
        return m

    def seed(self, seeds: DataFrame) -> dict:
        return self.enqueue(
            seeds.select(F.col("url"),
                         F.col("added_time_ms").alias("added_ms"),
                         F.lit(0).alias("hopcount"),
                         F.coalesce(F.col("is_seed"), F.lit(True)).alias("is_seed"))
        )

    # ------------------------------------------------------------------ #
    # one round — oracle_sim steps 1–5, 7                                 #
    # ------------------------------------------------------------------ #
    def run_round(self) -> int:
        T_ms = self.clock_ms
        f = self.frontier.join(self.host_state, "firstip", "left").withColumn(
            "next_ok_ms", F.coalesce(F.col("next_ok_ms"), F.lit(0)))
        elig = f.where(F.col("next_ok_ms") <= F.lit(T_ms))

        if self.cfg.tournament_salts > 1:
            # megahost-skew guard: identical winners, bounded task size
            from gigaspark.operators.skew import tournament_prune
            elig = tournament_prune(elig, ["firstip"], _win_order(),
                                    self.k_max, "urlhash48",
                                    self.cfg.tournament_salts)

        w = Window.partitionBy("firstip").orderBy(*_win_order())
        ranked = (
            elig.withColumn("rn", F.row_number().over(w))
            .withColumn("k_host", F.first("max_spiders_per_ip").over(w))
        )
        winners = ranked.where(F.col("rn") <= F.greatest(F.col("k_host"), F.lit(1)))
        # politeness gap per fetched URL: fetch + max(rule wait, host crawl_delay)
        winners = winners.join(F.broadcast(self.host_delays), "host", "left").withColumn(
            "gap_ms",
            F.lit(self.cfg.fetch_ms)
            + F.greatest(F.col("same_ip_wait_ms"),
                         F.coalesce(F.col("crawl_delay_ms"), F.lit(0))),
        )
        cum = Window.partitionBy("firstip").orderBy(*_win_order()).rowsBetween(
            Window.unboundedPreceding, -1)
        winners = (
            winners.withColumn(
                "scheduled_time_ms",
                F.lit(T_ms) + F.coalesce(F.sum("gap_ms").over(cum), F.lit(0)))
            .withColumn("round", F.lit(self.round))
            .localCheckpoint(eager=True)
        )

        emitted = winners.select(*EMIT_COLS)
        self.emitted_parts.append(emitted)

        if self.cfg.validate_fetch and self.page_image is not None:
            from gigaspark.operators.fetch import validate_fetch
            self.fetched_parts.append(
                validate_fetch(emitted, self.page_image, self.images,
                               self.images_golden).localCheckpoint(eager=True))

        # host_state merge: fetched hosts get next_ok = last slot end
        upd = winners.groupBy("firstip").agg(
            F.max(F.col("scheduled_time_ms") + F.col("gap_ms")).alias("next_ok_ms"))
        self.host_state = (
            self.host_state.join(upd.select("firstip"), "firstip", "left_anti")
            .unionByName(upd)
            .localCheckpoint(eager=True)
        )
        self.frontier = self.frontier.join(
            winners.select("firstip", "urlhash48"),
            ["firstip", "urlhash48"], "left_anti").localCheckpoint(eager=True)

        counts = winners.agg(
            F.count("*").alias("n"),
            F.sum(F.col("harvest_links").cast("int")).alias("n_harvest")).collect()[0]
        n_emitted = int(counts["n"] or 0)
        m = {"round": self.round, "clock_ms": T_ms, "emitted": n_emitted}

        self.round += 1
        # skip the whole enqueue pipeline when no winner harvests links
        # (saves ~8 empty-DF jobs per round — most rounds in a drain)
        if counts["n_harvest"]:
            outlinks = (
                winners.where(F.col("harvest_links"))
                .join(self.links, winners["url"] == self.links["src_url"])
                .select(
                    F.col("dst_url").alias("url"),
                    (F.col("scheduled_time_ms") + F.lit(self.cfg.fetch_ms)).alias("added_ms"),
                    (F.col("hopcount") + 1).alias("hopcount"),
                    F.lit(False).alias("is_seed"),
                )
            )
            m.update(self.enqueue(outlinks))
        self.metrics.append(m)

        stats = self.frontier.join(self.host_state, "firstip", "left").agg(
            F.count("*").alias("pending"),
            F.min(F.coalesce(F.col("next_ok_ms"), F.lit(0))).alias("min_ok"),
        ).collect()[0]
        if stats["pending"] and stats["pending"] > 0:
            self.clock_ms = max(self.clock_ms, int(stats["min_ok"]))
        m["pending"] = int(stats["pending"] or 0)

        if self.cfg.checkpoint_every and self.round % self.cfg.checkpoint_every == 0:
            self.checkpoint()
        return n_emitted

    def run(self, max_rounds: int = 1_000_000, seeds: DataFrame | None = None) -> DataFrame:
        if seeds is not None:
            self.seed(seeds)
        while self.round < max_rounds:
            if self.run_round() == 0 and not self.metrics[-1]["pending"]:
                break
        return self.emitted_df()

    # ------------------------------------------------------------------ #
    def emitted_df(self) -> DataFrame:
        """Golden-order schedule with the final global seq (W1)."""
        if not self.emitted_parts:
            return self.spark.createDataFrame(
                [],
                "seq long, round int, scheduled_time_ms long, priority int,"
                " added_ms long, urlhash48 long, url string, firstip int,"
                " hopcount int, host string",
            )
        acc = self.emitted_parts[0]
        for p in self.emitted_parts[1:]:
            acc = acc.unionByName(p)
        order = [F.col("round").asc(), F.col("scheduled_time_ms").asc(),
                 F.col("priority").desc(), F.col("added_ms").asc(),
                 F.col("urlhash48").asc()]
        from gigaspark.operators.ordering import with_global_seq
        n_emitted = sum(m.get("emitted", 0) for m in self.metrics) or None
        return with_global_seq(acc, order, "seq",
                               small_count=n_emitted).select("seq", *EMIT_COLS)

    def fetched_df(self) -> DataFrame | None:
        if not self.fetched_parts:
            return None
        acc = self.fetched_parts[0]
        for p in self.fetched_parts[1:]:
            acc = acc.unionByName(p)
        return acc

    def metrics_df(self) -> DataFrame:
        keys = sorted({k for m in self.metrics for k in m})
        rows = [{k: int(m.get(k, 0)) for k in keys} for m in self.metrics]
        return self.spark.createDataFrame(rows)

    # ------------------------------------------------------------------ #
    # checkpoint / resume (ST4)                                           #
    # ------------------------------------------------------------------ #
    def checkpoint(self) -> dict:
        if self.store is None:
            raise ValueError("no state_dir configured")
        tables = {
            "frontier": self.frontier,
            "seen": self.seen,
            "host_state": self.host_state,
            "emitted": self.emitted_df(),
        }
        if self.segments is not None:
            tables["bloom_segments"] = self.segments
        meta = {"round": self.round, "clock_ms": self.clock_ms,
                "metrics": self.metrics,
                "bloom": {"n_segments": self.cfg.bloom.n_segments,
                          "m_bits": self.cfg.bloom.m_bits}}
        return self.store.commit(self.round, tables, meta)

    @classmethod
    def resume(cls, spark: SparkSession, fixtures: dict[str, DataFrame],
               state_dir: str, config: CrawlConfig | None = None) -> "CrawlScheduler":
        sched = cls(spark, fixtures, config, state_dir)
        manifest = sched.store.latest()
        if manifest is None:
            raise FileNotFoundError(f"no MANIFEST.json under {state_dir}")
        tbl = sched.store.load_tables(spark, manifest)
        sched.frontier = tbl["frontier"].localCheckpoint(eager=True)
        sched.seen = tbl["seen"].localCheckpoint(eager=True)
        sched.host_state = tbl["host_state"].localCheckpoint(eager=True)
        if "bloom_segments" in tbl:
            sched.segments = tbl["bloom_segments"].localCheckpoint(eager=True)
        emitted = tbl["emitted"]
        if emitted.columns and not emitted.rdd.isEmpty():
            sched.emitted_parts = [emitted.select(*EMIT_COLS).localCheckpoint(eager=True)]
        sched.round = manifest["meta"]["round"]
        sched.clock_ms = manifest["meta"]["clock_ms"]
        sched.metrics = list(manifest["meta"]["metrics"])
        return sched
