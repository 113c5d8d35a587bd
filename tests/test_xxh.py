"""xxh64 parity with Spark's F.xxhash64 — the oracle/engine hash contract."""

import pyspark.sql.functions as F

from gigaspark.xxh import URLHASH48_MASK, urlhash48, xxh64_signed


def test_xxh64_matches_spark(spark):
    cases = ["", "a", "hello", "http://host1.example/p/7", "x" * 7, "y" * 8,
             "z" * 31, "w" * 32, "q" * 100, "üñïçødé-url/päth?q=1",
             "www.host3.example"]
    rows = (
        spark.createDataFrame([(c,) for c in cases], ["s"])
        .select("s", F.xxhash64("s").alias("h"),
                F.xxhash64("s").bitwiseAND(F.lit(URLHASH48_MASK)).alias("h48"))
        .collect()
    )
    for r in rows:
        assert xxh64_signed(r["s"].encode()) == r["h"]
        assert urlhash48(r["s"]) == r["h48"]


def test_urlhash48_range():
    for s in ["a", "b", "http://x/y"]:
        h = urlhash48(s)
        assert 0 <= h < (1 << 48)
