"""Real-Iceberg StateStore adapter (round-3 verdict item 6).

`tableio.StateStore` emulates the Iceberg commit protocol over plain
parquet + an atomically-swapped JSON manifest, because this sandbox
ships no `iceberg-spark-runtime` jars.  This module is the swap-in
adapter for a real deployment: the SAME interface (commit / latest /
at / snapshots / expire_snapshots / load_tables) expressed over actual
Iceberg tables, so `CrawlScheduler.save()` / `resume()` work unchanged
when the jars appear (`state_format="iceberg"`).

Mapping of the emulated concepts onto Iceberg's own:

=====================  ==========================================
emulated (tableio.py)  real Iceberg
=====================  ==========================================
snap_<id>/ parquet     table data files at a snapshot
manifest_<id>.json     Iceberg snapshot + manifest list
MANIFEST.json pointer  current-snapshot-id in table metadata
at(id) time travel     tag read (``VERSION AS OF 'r<id>'``)
expire_snapshots()     drop tags + ``CALL catalog.system.expire_snapshots``
per-file lineage       ``<table>.files`` metadata table
=====================  ==========================================

Crawl-round metadata (round, clock_ms, metrics — the driver scalars a
resume needs) rides in a one-row `_meta` Iceberg table per commit.

CRASH CONSISTENCY (ADVICE r4): each table's REPLACE is atomic, but the
multi-table commit is not — a crash mid-commit can leave some data
tables already at round N while `_meta` still says N-1.  The protocol
therefore NEVER reads a data table's current snapshot on resume:

  * commit order: data tables first (replace + tag ``r<N>``), ``_meta``
    strictly LAST.  A round exists iff `_meta` carries tag ``r<N>``.
  * `latest()` / `at()` resolve to a round id from `_meta`'s tags and
    read EVERY table via that round's tag — tags pin the old snapshot,
    so half-written round-N data is invisible until `_meta` lands and
    the next `commit()`'s REPLACE simply overwrites the orphan.
  * a data table missing tag ``r<N>`` did not exist in round N and is
    excluded from that round's state.

`expire_snapshots()` drops old round tags AND calls Iceberg's
`expire_snapshots` procedure per table so unreferenced data files are
actually garbage-collected (not just de-tagged).

The spark session must be built with the Iceberg extensions and a
catalog, e.g.::

    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.gigaspark",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.gigaspark.type", "hadoop")
    .config("spark.sql.catalog.gigaspark.warehouse", "<root>")

Verified two ways: tests/test_iceberg.py runs the full protocol when a
runtime jar is on the classpath (SKIPPED visibly otherwise), and
tests/test_iceberg_sql.py pins every generated SQL statement against
golden strings so the adapter cannot rot silently while jar-less.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from gigaspark.session import bounded_collect


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True iff an iceberg-spark-runtime jar is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------- #
# SQL text builders — pure functions, golden-pinned by tests/test_iceberg_sql #
# --------------------------------------------------------------------------- #

def sql_create_namespace(catalog: str, ns: str) -> str:
    return f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{ns}"


def sql_create_tag(fq_table: str, round_id: int) -> str:
    return f"ALTER TABLE {fq_table} CREATE OR REPLACE TAG `r{round_id}`"


def sql_drop_tag(fq_table: str, round_id: int) -> str:
    return f"ALTER TABLE {fq_table} DROP TAG IF EXISTS `r{round_id}`"


def sql_files(fq_table: str) -> str:
    return f"SELECT file_path, record_count FROM {fq_table}.files"


def sql_refs(fq_table: str) -> str:
    return f"SELECT name FROM {fq_table}.refs WHERE type = 'TAG'"


def sql_show_tables(catalog: str, ns: str) -> str:
    return f"SHOW TABLES IN {catalog}.{ns}"


def sql_meta_at(fq_meta: str, version: str | None = None) -> str:
    q = f"SELECT * FROM {fq_meta}"
    if version:
        q += f" VERSION AS OF '{version}'"
    return q


def sql_expire_snapshots(catalog: str, ns: str, name: str,
                         older_than_iso: str, retain_last: int) -> str:
    """Iceberg stored-procedure CALL that physically GCs data files no
    retained snapshot (tag/branch/current) references.  ``retain_last``
    keeps that many newest snapshots regardless of age; tagged
    snapshots are never expired, so round tags stay readable."""
    return (f"CALL {catalog}.system.expire_snapshots("
            f"table => '{ns}.{name}', "
            f"older_than => TIMESTAMP '{older_than_iso}', "
            f"retain_last => {retain_last})")


class IcebergStateStore:
    """Drop-in for tableio.StateStore over a real Iceberg catalog.

    ``catalog`` must already be configured on the session (see module
    docstring); ``namespace`` scopes one crawl's state tables.
    """

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str = "crawl_state",
                 keep_last: int | None = 2):
        self.spark = spark
        self.catalog = catalog
        self.ns = namespace
        self.keep_last = keep_last
        spark.sql(sql_create_namespace(catalog, namespace))

    def _tbl(self, name: str) -> str:
        return f"{self.catalog}.{self.ns}.{name}"

    # -- commit protocol -------------------------------------------------
    def commit(self, snapshot_id: int, tables: dict[str, DataFrame],
               meta: dict) -> dict:
        """One crawl-round commit: replace each state table's contents
        (an Iceberg REPLACE is a single atomic snapshot per table), tag
        the new snapshot with the round id, and commit `_meta` strictly
        LAST — the round becomes visible to `latest()`/`at()` only once
        `_meta` carries its tag, so a crash anywhere earlier leaves the
        previous round fully readable via its tags (module docstring)."""
        meta_row = [(int(snapshot_id), json.dumps(meta))]
        lineage: dict[str, list[dict]] = {}
        ordered = [*tables.items(),
                   ("_meta", self.spark.createDataFrame(
                       meta_row, "snapshot_id long, meta_json string"))]
        for name, df in ordered:
            fq = self._tbl(name)
            df.writeTo(fq).using("iceberg").createOrReplace()
            self.spark.sql(sql_create_tag(fq, snapshot_id))
            lineage[name] = [
                {"file": r["file_path"], "rows": r["record_count"]}
                for r in bounded_collect(self.spark.sql(sql_files(fq)),
                                         1_000_000, "iceberg file lineage")]
        if self.keep_last is not None:
            self.expire_snapshots(self.keep_last)
        return {"snapshot_id": snapshot_id,
                "tables": {n: self._tbl(n) for n in tables},
                "lineage": lineage, "meta": meta}

    # -- readback --------------------------------------------------------
    def _meta_at(self, version: str | None = None) -> dict | None:
        fq = self._tbl("_meta")
        if not self.spark.catalog.tableExists(fq):
            return None
        rows = bounded_collect(self.spark.sql(sql_meta_at(fq, version)),
                               1, "_meta commit marker")
        if not rows:
            return None
        return {"snapshot_id": rows[0]["snapshot_id"],
                "tables": {}, "meta": json.loads(rows[0]["meta_json"])}

    def latest(self) -> dict | None:
        """State of the newest COMPLETE round.  Resolves through
        `_meta`'s round tags (never a data table's current snapshot):
        a crash mid-commit leaves round N's tags absent from `_meta`,
        so this lands on N-1 and every table is read via its r{N-1}
        tag — consistent by construction (ADVICE r4)."""
        ids = self.snapshots()
        if not ids:
            return None
        return self.at(ids[-1])

    def _table_names(self) -> list[str]:
        rows = bounded_collect(
            self.spark.sql(sql_show_tables(self.catalog, self.ns)),
            10_000, "state-table listing")
        return [r["tableName"] for r in rows if r["tableName"] != "_meta"]

    def _tags_of(self, name: str) -> set[int]:
        fq = self._tbl(name)
        if not self.spark.catalog.tableExists(fq):
            return set()
        rows = bounded_collect(self.spark.sql(sql_refs(fq)),
                               100_000, "round tags")
        return {int(r["name"][1:]) for r in rows
                if r["name"].startswith("r") and r["name"][1:].isdigit()}

    def snapshots(self) -> list[int]:
        """Retained COMPLETE round ids (from the per-round tags on
        `_meta` — the commit-marker table, written last)."""
        return sorted(self._tags_of("_meta"))

    def at(self, snapshot_id: int) -> dict:
        """Time-travel: state as of round ``snapshot_id`` (tag reads).
        Tables lacking the round's tag did not exist that round and are
        excluded (e.g. a table first created by a later, or crashed,
        round)."""
        tag = f"r{snapshot_id}"
        m = self._meta_at(version=tag)
        if m is None:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not retained"
                f" (have {self.snapshots()})")
        m["tables"] = {n: (self._tbl(n), tag) for n in self._table_names()
                       if snapshot_id in self._tags_of(n)}
        return m

    def expire_snapshots(self, keep_last: int = 2,
                         older_than: datetime | None = None) -> list[int]:
        """Drop all but the newest ``keep_last`` round tags, then CALL
        Iceberg's ``expire_snapshots`` procedure per table so the
        now-unreferenced snapshots' data files are physically GC'd
        (tag-drop alone never deletes files — ADVICE r4)."""
        ids = self.snapshots()
        expired = ids[:-max(keep_last, 1)] if keep_last else []
        when = older_than or datetime.now(timezone.utc)
        iso = when.strftime("%Y-%m-%d %H:%M:%S")
        for name in [*self._table_names(), "_meta"]:
            fq = self._tbl(name)
            if not self.spark.catalog.tableExists(fq):
                continue
            for sid in expired:
                self.spark.sql(sql_drop_tag(fq, sid))
            self.spark.sql(sql_expire_snapshots(
                self.catalog, self.ns, name, iso, max(keep_last, 1)))
        return expired

    def load_tables(self, spark: SparkSession,
                    manifest: dict) -> dict[str, DataFrame]:
        out = {}
        for name, ref in manifest["tables"].items():
            if isinstance(ref, tuple) or isinstance(ref, list):
                fq, tag = ref
                out[name] = spark.read.option("tag", tag).table(fq)
            else:
                out[name] = spark.read.table(ref)
        return out
