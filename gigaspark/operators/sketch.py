"""Distributed cardinality sketching — HyperLogLog, integer-pinned
(Flajolet et al. 2007, public; Spark's own ``approx_count_distinct``
is HLL++, but its registers are engine-private — this implementation
pins every step so a DuckDB oracle reproduces the ESTIMATE bit-exactly,
which also makes sketches mergeable across engines).

Crawl-tier use (the Spiderdb per-site stats analogue [U][M]): distinct
URLs per host at 10^10 scale is exactly where you stop counting
exactly — 64 registers ≈ 13% standard error in O(1) memory per host,
mergeable across partitions and crawl rounds by register-max.

Pinned law (m = 64 registers):

  * h = first 60 bits of md5(item) as an integer;
  * bucket = h % 64; w = h DIV 64 (54 bits);
  * rho = 55 − bitlen(w) (bitlen via ``length(bin(w))``, identical
    string function in both engines; w = 0 → rho 55);
  * register M_b = max rho in bucket b; absent buckets count M = 0;
  * the harmonic sum is EXACT integers: S = Σ_b (2^30 >> M_b)
    (absent buckets contribute 2^30 each);
  * raw = (709 · 64 · 64 · 2^30) DIV (1000 · S)   [α_64 = 0.709];
  * small-range (raw ≤ 2.5m and V = #zero-registers > 0): linear
    counting 64·ln(64/V), with ln quantized to e-4 before the integer
    multiply (the repo's lmfilter ln-ULP discipline) — both engines
    agree on all 64 possible V values.

Scale shape: ONE map-side-combinable (key, bucket) max-agg — the same
shuffle class as a plain count — then a 64-row-per-key rollup.
Register-max is associative/commutative/idempotent: sketches merge
across partitions, rounds, and engines by element-wise max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

M_REG = 64
ALPHA_PM = 709          # alpha_64 in permille
POW = 1 << 30


def hll_registers(df: DataFrame, key: str, item: str) -> DataFrame:
    """(key, bucket, register) — merge further with max(register)."""
    h = F.conv(F.substring(F.md5(F.col(item)), 1, 15), 16, 10).cast("long")
    hashed = df.select(F.col(key).alias("key"), h.alias("h"))
    hashed = hashed.withColumn("bucket", F.col("h") % M_REG) \
                   .withColumn("w", F.expr(f"h DIV {M_REG}"))
    rho = F.when(F.col("w") == 0, F.lit(55)) \
           .otherwise(F.lit(55) - F.length(F.expr("bin(w)")))
    return (hashed.select("key", "bucket", rho.cast("int").alias("rho"))
            .groupBy("key", "bucket")
            .agg(F.max("rho").alias("register")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(key, estimate) from a register table (absent buckets = 0)."""
    agg = (registers.groupBy("key")
           .agg(F.count("*").alias("n_present"),
                F.sum(F.expr(f"CAST({POW} AS BIGINT) DIV"
                             " shiftleft(CAST(1 AS BIGINT), register)"))
                .alias("s_present"),
                F.sum((F.col("register") == 0).cast("long"))
                .alias("z_present")))
    s = (F.col("s_present")
         + (F.lit(M_REG) - F.col("n_present")) * F.lit(POW))
    v = F.col("z_present") + (F.lit(M_REG) - F.col("n_present"))
    raw = F.expr(f"CAST({ALPHA_PM} AS BIGINT) * {M_REG} * {M_REG}"
                 f" * CAST({POW} AS BIGINT) DIV (1000 * s)")
    lc = F.expr(f"({M_REG} * CAST(round(ln({M_REG} / CAST(v AS DOUBLE))"
                " * 10000, 0) AS BIGINT)) DIV 10000")
    return (agg.withColumn("s", s).withColumn("v", v)
            .withColumn("raw", raw)
            .select("key",
                    F.when((F.col("raw") <= int(2.5 * M_REG))
                           & (F.col("v") > 0), lc)
                    .otherwise(F.col("raw")).alias("estimate")))


def hll_count_distinct(df: DataFrame, key: str, item: str) -> DataFrame:
    """(key, estimate) in one pass — sketch + rollup."""
    return hll_estimate(hll_registers(df, key, item))


CM_DEPTH = 4
CM_WIDTH = 256


def cm_sketch(df: DataFrame, key: str, weight: str | None = None,
              depth: int = CM_DEPTH, width: int = CM_WIDTH) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public) —
    frequency estimation in O(depth·width) memory, the companion to
    the HLL cardinality sketch (term/host heavy-hitters at the scale
    where an exact histogram won't fit: Spiderdb hot-host stats,
    Posdb hot-term stats [U][M]).

    Pinned law: row r hashes an item to bucket
    ``md5('cm<r>#' || item) % width`` (first-8-hex integer, the repo
    idiom); cell = Σ weights (exact integers).  Returns
    (row, bucket, cell) — sketches MERGE by cell-wise sum
    (associative), exactly like the HLL register-max merge.

    Scale shape: ``depth`` narrow projections unioned, then ONE
    map-side-combinable (row, bucket) sum agg — same shuffle class as
    a word count, with the output bounded at depth×width rows.
    """
    w = F.col(weight) if weight else F.lit(1).cast("long")
    parts = []
    for r in range(depth):
        bucket = (F.conv(F.substring(F.md5(
            F.concat(F.lit(f"cm{r}#"), F.col(key))), 1, 8), 16, 10)
            .cast("long") % width)
        parts.append(df.select(F.lit(r).alias("row"),
                               bucket.alias("bucket"), w.alias("w")))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy("row", "bucket")
            .agg(F.sum("w").cast("long").alias("cell")))


def cm_estimate(sketch: DataFrame, queries: DataFrame,
                key: str, depth: int = CM_DEPTH,
                width: int = CM_WIDTH) -> DataFrame:
    """(key, estimate) — point queries against a sketch: min over the
    depth cells the item hashes to (the CM guarantee: estimate >=
    true, overestimate bounded by N·e/width per row).  The probe side
    explodes ×depth and broadcast-joins the depth×width sketch."""
    probes = []
    for r in range(depth):
        bucket = (F.conv(F.substring(F.md5(
            F.concat(F.lit(f"cm{r}#"), F.col(key))), 1, 8), 16, 10)
            .cast("long") % width)
        probes.append(queries.select(F.col(key).alias("key"),
                                     F.lit(r).alias("row"),
                                     bucket.alias("bucket")))
    allq = probes[0]
    for p in probes[1:]:
        allq = allq.unionByName(p)
    return (allq.join(F.broadcast(sketch), ["row", "bucket"])
            .groupBy("key").agg(F.min("cell").alias("estimate")))
