"""Golden-parquet oracle freshness: the stored goldens for the
multimodal decode queries must equal what the current code computes.

If a deliberate codec/feature change lands, regenerate with
``python tools/make_golden.py`` and commit the new goldens — this test
failing on an UNINTENDED diff is the whole point (it catches silent
decode regressions that a rows-only check never would)."""

from __future__ import annotations

import math
import pathlib

import duckdb
import pytest

import __spark_entry__ as E

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


def _canon(v):
    # mirror of tools/check_oracle.py canon_val
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


@pytest.mark.parametrize("name", sorted(
    n for n in E.oracle_sql()
    if "read_parquet" in E.oracle_sql()[n] and "golden" in E.oracle_sql()[n]))
def test_golden_matches_recompute(spark, name):
    df = E.queries()[name](spark, "/root/testdata/sf0.001")
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    got = sorted(tuple(_canon(r[i]) for i in order) for r in df.collect())

    res = duckdb.sql(E.oracle_sql()[name])
    dcols = res.columns
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    want = sorted(tuple(_canon(r[i]) for i in dorder) for r in res.fetchall())

    assert sorted(c.lower() for c in cols) == sorted(c.lower() for c in dcols)
    assert len(got) > 0, f"{name}: vacuous golden"
    assert got == want, (
        f"{name}: recompute differs from stored golden — if the change "
        f"is deliberate run `python tools/make_golden.py {name}`")
