"""Tri-scale full-surface correctness sweep → CORRECTNESS_FULL_rN.json.

Round-3 verdict item 2: the driver's CORRECTNESS window records only
the first 50 `queries()` entries, leaving the rest without a
machine-recorded row.  This tool runs EVERY entry against its DuckDB
oracle at each requested scale factor and writes one JSON artifact so
all 151 entries have a recorded green (or red) row per round.

Usage: python tools/full_sweep.py OUT.json [sf_dir ...]
       (default sf dirs: sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from gigaspark.session import get_spark  # noqa: E402
from tools.check_oracle import canon_rows  # noqa: E402

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]


def run_sf(spark, sf_dir: str) -> dict:
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{sf_dir}/{t}.parquet')")
    out = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        rec: dict = {}
        try:
            df = fn(spark, sf_dir)
            scols = [c.lower() for c in df.columns]
            srows = [tuple(r) for r in df.collect()]
            res = con.sql(E.oracle_sql()[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
            rec["rows"] = len(srows)
            rec["rows_match"] = len(srows) == len(drows)
            rec["schema_match"] = sorted(scols) == sorted(dcols)
            rec["hash_match"] = (rec["schema_match"]
                                 and canon_rows(scols, srows)
                                 == canon_rows(dcols, drows))
            rec["ok"] = bool(rec["rows_match"] and rec["schema_match"]
                             and rec["hash_match"])
        except Exception as ex:  # noqa: BLE001 — recorded, not raised
            rec["ok"] = False
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        rec["secs"] = round(time.time() - t0, 2)
        out[name] = rec
        tag = "OK  " if rec["ok"] else "FAIL"
        print(f"{tag} {sf_dir.rsplit('/', 1)[-1]} {name}"
              f" ({rec['secs']}s)", flush=True)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"
    sf_dirs = sys.argv[2:] or DEFAULT_SFS
    spark = get_spark("full-sweep", cores=8, shuffle_partitions=8)
    result = {"queries": {}, "sf_dirs": sf_dirs}
    for sf_dir in sf_dirs:
        sf = sf_dir.rsplit("/", 1)[-1]
        for name, rec in run_sf(spark, sf_dir).items():
            result["queries"].setdefault(name, {})[sf] = rec
    n_ok = sum(all(r["ok"] for r in per_sf.values())
               for per_sf in result["queries"].values())
    result["n_queries"] = len(result["queries"])
    result["n_green_all_sfs"] = n_ok
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(result['queries'])} green at all SFs → {out_path}")
    sys.exit(0 if n_ok == len(result["queries"]) else 1)


if __name__ == "__main__":
    main()
