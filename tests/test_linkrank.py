"""Integer-pinned PageRank unit fixtures (hand-computed ladder)."""

from __future__ import annotations

from gigaspark.operators.linkrank import pagerank


def test_pagerank_hand_computed(spark):
    """1→{2,3}, 2→1; node 3 dangling. N=3, scale 1e9:
    r0 = 333333333 each; base = 15e9//300 = 50_000_000.
    iter1: r(1)=50e6+85*333333333//100=333333333,
           r(2)=r(3)=50e6+85*166666666//100=191666666.
    iter2: r(1)=50e6+85*191666666//100=212916666,
           r(2)=r(3)=191666666 (node 1's rank halves again)."""
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 1)], "src long, dst long")
    r1 = {r["id"]: r["pagerank"] for r in pagerank(edges, n_iter=1).collect()}
    assert r1 == {1: 333333333, 2: 191666666, 3: 191666666}
    r2 = {r["id"]: r["pagerank"] for r in pagerank(edges, n_iter=2).collect()}
    assert r2 == {1: 212916666, 2: 191666666, 3: 191666666}


def _opic_brute(edges: list[tuple[int, int]], n_iter: int,
                scale: int = 1_000_000_000) -> dict[int, tuple[int, int]]:
    """Pure-python mirror of the pinned OPIC law: returns id -> (cash,
    history) after n_iter synchronous rounds."""
    nodes = sorted({u for e in edges for u in e})
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    c = {v: scale // n for v in nodes}
    h = {v: 0 for v in nodes}
    for _ in range(n_iter):
        nh = {v: h[v] + c[v] for v in nodes}
        dang = sum(c[v] for v in nodes if v not in out)
        nc = {v: dang // n for v in nodes}
        for u, ds in out.items():
            share = c[u] // len(ds)
            for d in ds:
                nc[d] += share
        c, h = nc, nh
    return {v: (c[v], h[v]) for v in nodes}


def test_opic_vs_brute_force(spark):
    """The Spark plan reproduces the pinned integer OPIC law exactly on
    a graph with a dangling node, a 2-cycle, and a fan-out hub."""
    from gigaspark.operators.linkrank import opic

    edges = [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 5), (6, 1)]
    want = _opic_brute(edges, n_iter=3)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["cash"], r["history"]) for r in opic(df, 3).collect()}
    assert got == want
    # importance = cash + history, and total importance grows by ~scale
    # per round (cash mass is conserved up to floor-div dust)
    imp = {r["id"]: r["importance"] for r in opic(df, 3).collect()}
    assert imp == {v: c + h for v, (c, h) in want.items()}


def test_opic_hub_outranks_leaf(spark):
    """Everything points at node 1 → it accumulates the most history."""
    from gigaspark.operators.linkrank import opic

    df = spark.createDataFrame([(2, 1), (3, 1), (4, 1), (1, 2)],
                               "src long, dst long")
    rows = {r["id"]: r["importance"] for r in opic(df, 4).collect()}
    assert rows[1] == max(rows.values())


def test_pagerank_symmetric_cycle(spark):
    """A 2-cycle is a fixed point: every node keeps scale//N."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["id"]: r["pagerank"] for r in pagerank(edges, n_iter=4).collect()}
    assert got == {1: 500000000, 2: 500000000}


def test_hits_star_graph(spark):
    """Hub-and-spoke: the center pointed at by all others is the sole
    max authority; the pointers are the max hubs."""
    from gigaspark.operators.linkrank import hits

    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (1, 5)], "src long, dst long")
    got = {r["id"]: (r["hub"], r["authority"])
           for r in hits(edges, n_iter=2).collect()}
    S = 1_000_000
    assert got[1][1] == S                        # normalized max authority
    for spoke in (2, 3, 4):
        assert got[spoke][0] == S                # all tie as max hubs
        assert got[spoke][1] == 0                # nothing points at them
    assert got[5][0] == 0                        # node 5 points at nothing
