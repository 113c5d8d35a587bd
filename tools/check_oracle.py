"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() on the same sf dir,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from gigaspark.session import get_spark  # noqa: E402


def canon_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(E.queries())
    if unknown:
        # an unregistered name must fail loudly, not vacuously pass
        print(f"FAIL unknown queries: {sorted(unknown)}")
        sys.exit(2)
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in sqls:
            print(f"weak {name}: rows={len(srows)} ({time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            res = con.sql(sqls[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        sc = sorted(c.lower() for c in scols)
        dc = sorted(dcols)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} vs {dc}")
            failed.append(name)
            continue
        a = canon_rows([c.lower() for c in scols], srows)
        b = canon_rows(dcols, drows)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            failed.append(name)
            continue
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"   spark:  {a[bad]}")
            print(f"   duckdb: {b[bad]}")
            failed.append(name)
            continue
        print(f"OK   {name}: {len(a)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nALL OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
