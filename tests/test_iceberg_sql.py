"""Golden pins for the Iceberg adapter's generated SQL (VERDICT r4 item 6).

No iceberg jar ships in this sandbox, so `tests/test_iceberg.py` skips
and the adapter would otherwise be unexercised between deployments.
These tests pin every SQL statement `IcebergStateStore` can emit to
exact golden strings — catalog DDL, tag management, time-travel reads,
metadata-table scans, and the `expire_snapshots` procedure CALL — so a
refactor cannot silently bend the SQL the real catalog will receive.
"""

from __future__ import annotations

from datetime import datetime, timezone

from gigaspark.io.tableio_iceberg import (
    sql_create_namespace, sql_create_tag, sql_drop_tag,
    sql_expire_snapshots, sql_files, sql_meta_at, sql_refs,
    sql_show_tables,
)

CAT, NS = "it", "crawl_state"
FQ = f"{CAT}.{NS}.frontier"


def test_namespace_ddl():
    assert (sql_create_namespace(CAT, NS)
            == "CREATE NAMESPACE IF NOT EXISTS it.crawl_state")


def test_tag_ddl():
    assert (sql_create_tag(FQ, 7)
            == "ALTER TABLE it.crawl_state.frontier "
               "CREATE OR REPLACE TAG `r7`")
    assert (sql_drop_tag(FQ, 7)
            == "ALTER TABLE it.crawl_state.frontier "
               "DROP TAG IF EXISTS `r7`")


def test_metadata_tables():
    assert (sql_files(FQ)
            == "SELECT file_path, record_count "
               "FROM it.crawl_state.frontier.files")
    assert (sql_refs(FQ)
            == "SELECT name FROM it.crawl_state.frontier.refs "
               "WHERE type = 'TAG'")
    assert sql_show_tables(CAT, NS) == "SHOW TABLES IN it.crawl_state"


def test_time_travel_read():
    meta = f"{CAT}.{NS}._meta"
    assert sql_meta_at(meta) == "SELECT * FROM it.crawl_state._meta"
    assert (sql_meta_at(meta, "r3")
            == "SELECT * FROM it.crawl_state._meta VERSION AS OF 'r3'")


def test_expire_snapshots_call():
    iso = datetime(2026, 8, 21, 12, 0, 0,
                   tzinfo=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    assert (sql_expire_snapshots(CAT, NS, "frontier", iso, 2)
            == "CALL it.system.expire_snapshots("
               "table => 'crawl_state.frontier', "
               "older_than => TIMESTAMP '2026-08-21 12:00:00', "
               "retain_last => 2)")
