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


def opic(edges: DataFrame, n_iter: int = 5,
         scale: int = SCALE) -> DataFrame:
    """(id, cash, history, importance) after ``n_iter`` synchronous
    OPIC rounds — On-line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003, public), the classic *crawler-side*
    page-importance estimator: unlike PageRank it converges while the
    crawl is still discovering the graph, which is why frontier
    schedulers use it to prioritize fetches (Gigablast's analogue is
    the siteNumInlinks-driven priority, Tagdb/SpiderRequest [U][M]).

    Integer-pinned batch variant so a DuckDB oracle is bit-exact:

      * ``c0 = SCALE // N`` cash per node, ``h0 = 0`` history;
      * each round, IN THIS ORDER (pinned):
          ``h' = h + c``                       (bank the cash)
          ``d  = Σ_{u: outdeg=0} c_u``         (dangling pot)
          ``c'_v = Σ_{u→v} c_u // outdeg_u  +  d // N``
        — floor division everywhere, dangling cash redistributed
        uniformly (the paper's "virtual page" wired to every node);
      * ``importance = h + c`` after the last round (cash-included
        estimate; the paper's H/total up to the constant).

    Scale shape: identical to :func:`pagerank` — one |E| shuffle per
    round (src-keyed join then dst-keyed agg); node count and the
    1-row dangling pot enter as broadcast aggregates.  Per-round state
    is stable_checkpoint'ed for the same compounding-stats reason.
    """
    from gigaspark.session import stable_checkpoint

    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct())
    nodes = stable_checkpoint(nodes)
    ncnt = nodes.agg(F.count("*").alias("n"))          # 1 row, broadcast
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = stable_checkpoint(edges.join(outdeg, "src"))  # (src, dst, outdeg)
    # nodes that have any outlink — the complement holds the dangling cash
    state = (nodes.join(F.broadcast(ncnt))
             .join(outdeg.withColumnRenamed("src", "id"), "id", "left")
             .select("id",
                     F.expr(f"CAST({scale} AS BIGINT) DIV n").alias("c"),
                     F.lit(0).cast("long").alias("h"),
                     F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    state = stable_checkpoint(state)
    for _ in range(n_iter):
        dang = state.agg(F.sum(F.when(F.col("outdeg") == 0, F.col("c"))
                               .otherwise(F.lit(0))).alias("d"))
        contrib = (ew.join(state.select(F.col("id").alias("src"), "c"), "src")
                   .select("dst", F.expr("c DIV outdeg").alias("x"))
                   .groupBy("dst").agg(F.sum("x").alias("s")))
        state = stable_checkpoint(
            state.join(contrib, state["id"] == contrib["dst"], "left")
            .join(F.broadcast(dang)).join(F.broadcast(ncnt))
            .select(state["id"],
                    F.expr("coalesce(s, CAST(0 AS BIGINT))"
                           " + coalesce(d, CAST(0 AS BIGINT)) DIV n")
                    .alias("c"),
                    F.expr("h + c").alias("h"),
                    state["outdeg"]))
    return state.select("id", "c", F.col("h").alias("history"),
                        F.expr("h + c").alias("importance")) \
                .withColumnRenamed("c", "cash")


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


def hits(edges: DataFrame, n_iter: int = 2,
         scale: int = 1_000_000) -> DataFrame:
    """(id, hub, authority) after ``n_iter`` HITS rounds (Kleinberg
    1999, public) — the hubs-and-authorities complement to PageRank/
    OPIC: authorities are pages good hubs point AT, hubs are pages
    that point at good authorities.

    Integer-pinned law (bit-exact in the unrolled DuckDB oracle):

      * ``h0 = scale`` for every node;
      * per round: ``a'_v = Σ_{u→v} h_u`` then NORMALIZE
        ``a = (a' * scale) DIV max(a')``; ``h'_u = Σ_{u→v} a_v`` then
        the same max-normalization — floor division, max as a
        broadcast 1-row aggregate (the paper's L2 norm is pinned to
        max-norm so everything stays integer);
      * nodes with no in/out edges hold score 0 after their first
        respective round.

    Scale shape: two |E| shuffles per round (dst-keyed then
    src-keyed agg) — same class as :func:`pagerank`; the
    normalization constant broadcasts.
    """
    from gigaspark.session import stable_checkpoint

    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct())
    nodes = stable_checkpoint(nodes)
    e = stable_checkpoint(edges.select("src", "dst").distinct())
    h = nodes.select("id", F.lit(scale).cast("long").alias("h"))
    a = nodes.select("id", F.lit(0).cast("long").alias("a"))
    for _ in range(n_iter):
        araw = (e.join(h.withColumnRenamed("id", "src"), "src")
                .groupBy("dst").agg(F.sum("h").alias("ar")))
        amax = araw.agg(F.max("ar").alias("m"))
        a = stable_checkpoint(
            nodes.join(araw.withColumnRenamed("dst", "id"), "id", "left")
            .join(F.broadcast(amax))
            .select("id", F.expr(
                f"coalesce((ar * CAST({scale} AS BIGINT)) DIV m,"
                " CAST(0 AS BIGINT))").alias("a")))
        hraw = (e.join(a.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src").agg(F.sum("a").alias("hr")))
        hmax = hraw.agg(F.max("hr").alias("m"))
        h = stable_checkpoint(
            nodes.join(hraw.withColumnRenamed("src", "id"), "id", "left")
            .join(F.broadcast(hmax))
            .select("id", F.expr(
                f"coalesce((hr * CAST({scale} AS BIGINT)) DIV m,"
                " CAST(0 AS BIGINT))").alias("h")))
    return (h.join(a, "id")
            .select("id", F.col("h").alias("hub"),
                    F.col("a").alias("authority")))
