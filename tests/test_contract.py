"""Driver-contract hygiene: the queries()/oracle_sql() surface stays
consistent — every query is either value-hash-oracled or on the
explicit rows-only allowlist (binary/streaming ops the driver checks
as rows-only), and no oracle exists without its query."""

from __future__ import annotations

import __spark_entry__ as E

# ops whose output genuinely isn't SQL-expressible (binary decode,
# PCM/DCT math) — the driver records a rows-only check for these
ROWS_ONLY = {
    "multimodal_features",
    "image_neardup",
    "audio_features",
    "video_frames",
    "video_scene_cuts",
    "image_exif_orientation",
    "image_quality_metrics",
}


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


def test_entry_contract(spark):
    df = E.entry(spark)
    assert df.count() > 0
    # named, duplicate-free schema (the driver hashes by column name)
    assert len(df.columns) == len(set(df.columns)) > 0
    assert all(not c.startswith("_") for c in df.columns)
