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
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def commit(self, snapshot_id: int, tables: dict[str, DataFrame],
               meta: dict) -> dict:
        snap_dir = os.path.join(self.root, f"snap_{snapshot_id:08d}")
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
        tmp = os.path.join(self.root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, os.path.join(self.root, MANIFEST))  # atomic pointer swap
        return manifest

    def latest(self) -> dict | None:
        p = os.path.join(self.root, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def load_tables(self, spark: SparkSession,
                    manifest: dict) -> dict[str, DataFrame]:
        return {name: spark.read.parquet(path)
                for name, path in manifest["tables"].items()}
