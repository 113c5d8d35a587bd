"""Canonicalizer: pinned-rule cases + pure↔vectorized↔Spark parity."""

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from gigaspark.functions.urls import (
    canonicalize_series, canonicalize_url, host_col, path_col,
    py_firstip, py_host, py_path, with_url_columns,
)
from gigaspark.xxh import urlhash48

CASES = {
    "HTTP://Host1.EXAMPLE:80/a/./b/../c//d?x=1&PHPSESSID=abc&y=2#frag":
        "http://host1.example/a/c/d?x=1&y=2",
    "host2.example/p/3": "http://host2.example/p/3",
    "https://Host.example.:443/%41%2Fb?sid=9": "https://host.example/A%2Fb",
    "http://h.example": "http://h.example/",
    "http://h.example/p/?jsessionid=1": "http://h.example/p/",
    "http://h.example/a/b/../../..//c": "http://h.example/c",
    "http://WWW.Host3.example/p/0": "http://www.host3.example/p/0",
    "http://h.example:8080/x": "http://h.example:8080/x",
    "http://h.example/?&": "http://h.example/",
}


def test_pinned_cases():
    for raw, want in CASES.items():
        assert canonicalize_url(raw) == want, raw


def test_idempotent():
    for want in CASES.values():
        assert canonicalize_url(want) == want


_url_chars = st.text(
    alphabet="abcXYZ019-._~/%?#&=:@ .", min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(host=st.from_regex(r"[A-Za-z][A-Za-z0-9.\-]{0,20}", fullmatch=True),
       rest=_url_chars,
       scheme=st.sampled_from(["http", "HTTP", "https", ""]))
def test_vectorized_matches_pure(host, rest, scheme):
    raw = (f"{scheme}://{host}/{rest}" if scheme else f"{host}/{rest}")
    got = canonicalize_series(pd.Series([raw])).iloc[0]
    assert got == canonicalize_url(raw)


def test_spark_udf_and_derived_columns(spark):
    raws = list(CASES.keys())
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    out = {r["orig"]: r for r in
           with_url_columns(df.withColumn("orig", F.col("url"))).collect()}
    for raw, want in CASES.items():
        row = out[raw]
        assert row["url"] == want
        assert row["host"] == py_host(want)
        assert row["path"] == py_path(want)
        assert row["urlhash48"] == urlhash48(want)
        assert row["firstip"] == py_firstip(py_host(want))


def test_host_path_parse_url_parity(spark):
    """Spark parse_url must agree with the pure py_host/py_path mirrors
    on canonical URLs (the only place they are applied)."""
    urls = ["http://host1.example/p/7", "http://www.host3.example/p/0",
            "https://h.example:8080/a/b?x=1", "http://h.example/"]
    rows = (
        spark.createDataFrame([(u,) for u in urls], ["url"])
        .select("url", host_col(F.col("url")).alias("h"),
                path_col(F.col("url")).alias("p"))
        .collect()
    )
    for r in rows:
        assert r["h"] == py_host(r["url"])
        assert r["p"] == py_path(r["url"])
