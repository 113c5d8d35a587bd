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


def test_pagerank_symmetric_cycle(spark):
    """A 2-cycle is a fixed point: every node keeps scale//N."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["id"]: r["pagerank"] for r in pagerank(edges, n_iter=4).collect()}
    assert got == {1: 500000000, 2: 500000000}
