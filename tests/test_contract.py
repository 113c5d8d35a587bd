"""Driver-contract hygiene: the queries()/oracle_sql() surface stays
consistent — every query is either value-hash-oracled or on the
explicit rows-only allowlist (binary/streaming ops the driver checks
as rows-only), and no oracle exists without its query."""

from __future__ import annotations

import __spark_entry__ as E

# ops whose output genuinely isn't SQL-expressible AND has no golden
# fixture — none since round 4: the multimodal decode queries now
# carry golden-parquet value oracles (tools/make_golden.py)
ROWS_ONLY: set[str] = set()


def test_every_query_is_oracled_or_allowlisted():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    missing = q - o - ROWS_ONLY
    assert not missing, f"queries with no oracle and no allowlist: {sorted(missing)}"
    stale = ROWS_ONLY - q
    assert not stale, f"allowlist entries no longer in queries(): {sorted(stale)}"


def test_oracle_sql_is_nonempty_ansi():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_div_truncates_toward_zero(spark):
    """Pin the cross-engine division invariant (round-3 verdict item
    5): Spark's integer ``DIV`` — and DuckDB's ``//`` on integers —
    TRUNCATE toward zero, while Python's ``//`` FLOORS.  Every sim
    mirror therefore uses ``int(a/b)``; this test goes red if anyone
    swaps it for ``//`` semantics in either direction.  Probes the
    sign lattice plus magnitude extremes in one Spark job."""
    import duckdb

    pairs = [(a, b)
             for a in (-7, -1, 0, 1, 7, -(2**40) - 3, 2**40 + 3)
             for b in (-3, -2, 2, 3, 86_400_000, -86_400_000)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["a"], r["b"]): r["q"]
           for r in df.selectExpr("a", "b", "a DIV b AS q").collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = int(a / b)          # truncation toward zero
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)
        duck = con.execute("SELECT ?::BIGINT // ?::BIGINT", [a, b]).fetchone()[0]
        assert duck == want, (a, b, duck, want)
        if (a < 0) != (b < 0) and a % b != 0:
            assert a // b != want  # floor genuinely differs here


def test_related_docs_nonvacuous(spark):
    """Round-3 verdict: the old absolute df band made this query
    return 0 rows at every SF, so its oracle green proved only that
    both engines agree on emptiness.  The rank-based rare pool must
    yield a NON-EMPTY result."""
    df = E.queries()["related_docs"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0, "related_docs went vacuous again"
    assert all(r["score"] > 0 for r in rows)


def test_entry_contract(spark):
    df = E.entry(spark)
    assert df.count() > 0
    # named, duplicate-free schema (the driver hashes by column name)
    assert len(df.columns) == len(set(df.columns)) > 0
    assert all(not c.startswith("_") for c in df.columns)
