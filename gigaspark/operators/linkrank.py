"""Link-graph rank propagation (PageRank, integer-pinned).

Gigablast ranks sites by inlink counts (Tagdb ``sitenuminlinks`` →
siteRank buckets [U][M], see ``siterank_inlinks``); the natural
scale-path generalization is power-iteration PageRank (Brin & Page
1998, public).  This implementation is pinned to INTEGER arithmetic so
a DuckDB oracle reproduces every value bit-for-bit:

  * ranks live at a fixed scale (default 1e9): ``r0 = SCALE // N``;
  * each step: ``r' = (15*SCALE) // (100*N)
                      + (85 * Σ_{u→v} (r_u // outdeg_u)) // 100``
    (floor division at every stage — no float anywhere);
  * dangling mass (nodes without outlinks) is dropped, the common
    simplification, pinned.

Scale shape: one edges⋈ranks join per iteration, shuffling |E| rows
keyed by src then dst — the textbook distributed PageRank plan; the
node count enters the plan as a broadcast 1-row aggregate (no driver
action during query construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000


def pagerank(edges: DataFrame, n_iter: int = 5,
             scale: int = SCALE) -> DataFrame:
    """(id, pagerank) after ``n_iter`` integer-pinned power iterations.

    ``edges``: (src, dst) DataFrame; self-loops and duplicates should be
    resolved by the caller (dedup upstream keeps the plan honest about
    what one iteration shuffles).

    The static sides (edges⋈outdeg, nodes) and each iteration's rank
    vector are stable_checkpoint'ed: a lazily unrolled 5-iteration plan
    re-scans the source per iteration and compounds Catalyst stats (the
    same pathology the crawl loop hit) — checkpointing caps plan depth
    at one iteration and scans the input exactly once.
    """
    from gigaspark.session import stable_checkpoint

    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct())
    nodes = stable_checkpoint(nodes)
    ncnt = nodes.agg(F.count("*").alias("n"))          # 1 row, broadcast
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = stable_checkpoint(edges.join(outdeg, "src"))  # (src, dst, outdeg)

    # `div` is true integer floor-toward-zero division on longs in BOTH
    # engines (Spark `DIV`, DuckDB `//`) — float `/`+cast would round
    # across integer boundaries and break bit-parity
    r = (nodes.join(F.broadcast(ncnt))
         .select("id", F.expr(f"CAST({scale} AS BIGINT) DIV n").alias("r")))
    for _ in range(n_iter):
        contrib = (ew.join(r, ew["src"] == r["id"])
                   .select("dst", F.expr("r DIV outdeg").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        r = stable_checkpoint(
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .join(F.broadcast(ncnt))
            .select("id", F.expr(
                f"CAST({15 * scale} AS BIGINT) DIV (100 * n)"
                " + (85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100"
            ).alias("r")))
    return r.select("id", F.col("r").alias("pagerank"))
