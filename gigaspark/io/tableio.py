"""Snapshot/manifest table layer — Iceberg-commit emulation (SURVEY §7.4.2).

Reference capability: Rdb persistence + restart rebuild (``Rdb`` memtable
dump / ``SpiderColl`` reload [U][M], SURVEY ST4).  No Iceberg runtime jars
ship with this sandbox's PySpark, so checkpoints are plain parquet dirs
plus an atomically-renamed JSON manifest — the same commit protocol shape
(write data files → write manifest → atomic pointer swap).  Swapping in
real Iceberg later only changes this module.

Each commit records per-table, PER-FILE row counts (the "per-partition
lineage" required by north_rule) gathered from parquet footer metadata —
no extra Spark job.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"


def _lineage(table_dir: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(table_dir, "*.parquet"))):
        try:
            md = pq.ParquetFile(f).metadata
            out.append({"file": os.path.basename(f), "rows": md.num_rows,
                        "bytes": os.path.getsize(f)})
        except Exception:  # zero-row file edge cases
            out.append({"file": os.path.basename(f), "rows": 0,
                        "bytes": os.path.getsize(f)})
    return out


class StateStore:
    """Snapshot store with Iceberg-shaped metadata: every commit writes
    its own versioned manifest (``manifest_<id>.json`` — the metadata
    history), then atomically swaps the ``MANIFEST.json`` pointer.
    ``at(id)`` time-travels to any retained snapshot;
    ``expire_snapshots(keep_last)`` GCs unreferenced snapshot dirs +
    manifests (never the current pointer's) so a 10^4-round crawl's
    state dir stays bounded.  ``keep_last=None`` disables auto-GC."""

    def __init__(self, root: str, keep_last: int | None = 2):
        self.root = root
        self.keep_last = keep_last
        os.makedirs(root, exist_ok=True)

    def _vmanifest(self, snapshot_id: int) -> str:
        return os.path.join(self.root, f"manifest_{snapshot_id:08d}.json")

    def _snap_dir(self, snapshot_id: int) -> str:
        return os.path.join(self.root, f"snap_{snapshot_id:08d}")

    def commit(self, snapshot_id: int, tables: dict[str, DataFrame],
               meta: dict) -> dict:
        snap_dir = self._snap_dir(snapshot_id)
        lineage: dict[str, list[dict]] = {}
        paths: dict[str, str] = {}
        for name, df in tables.items():
            tdir = os.path.join(snap_dir, name)
            df.write.mode("overwrite").parquet(tdir)
            paths[name] = tdir
            lineage[name] = _lineage(tdir)
        manifest = {
            "snapshot_id": snapshot_id,
            "committed_at": time.time(),
            "tables": paths,
            "lineage": lineage,
            "meta": meta,
        }
        # versioned manifest first (the history entry), pointer second —
        # a crash between the two leaves the previous snapshot current
        # and this one reachable via at(); both writes are atomic
        body = json.dumps(manifest, indent=2)
        tmp = self._vmanifest(snapshot_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, self._vmanifest(snapshot_id))
        tmp = os.path.join(self.root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, os.path.join(self.root, MANIFEST))
        if self.keep_last is not None:
            self.expire_snapshots(self.keep_last)
        return manifest

    def latest(self) -> dict | None:
        p = os.path.join(self.root, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- time travel + GC ------------------------------------------------
    def snapshots(self) -> list[int]:
        """Retained snapshot ids, ascending."""
        ids = []
        for p in glob.glob(os.path.join(self.root, "manifest_*.json")):
            stem = os.path.basename(p)[len("manifest_"):-len(".json")]
            if stem.isdigit():
                ids.append(int(stem))
        return sorted(ids)

    def at(self, snapshot_id: int) -> dict:
        """Time-travel: the manifest of a retained snapshot."""
        p = self._vmanifest(snapshot_id)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not retained under {self.root}"
                f" (have {self.snapshots()})")
        with open(p) as f:
            return json.load(f)

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (the current
        pointer's snapshot is always kept).  Returns the expired ids."""
        cur = self.latest()
        ids = self.snapshots()
        keep = set(ids[-max(keep_last, 1):])
        if cur is not None:
            keep.add(cur["snapshot_id"])
        expired = []
        for sid in ids:
            if sid in keep:
                continue
            shutil.rmtree(self._snap_dir(sid), ignore_errors=True)
            try:
                os.remove(self._vmanifest(sid))
            except FileNotFoundError:
                pass
            expired.append(sid)
        return expired

    def load_tables(self, spark: SparkSession,
                    manifest: dict) -> dict[str, DataFrame]:
        return {name: spark.read.parquet(path)
                for name, path in manifest["tables"].items()}
