"""Regenerate the golden-parquet value oracles for the multimodal
decode queries (round-3 verdict item 4: upgrade the rows-only checks
to full value-hash oracles).

These queries synthesize their binary fixtures deterministically
(seeded RNG, repo codecs) and IGNORE sf_dir, so one stored golden file
is valid at every scale factor: the DuckDB side of the oracle simply
``read_parquet``s the golden and the comparison pins Spark's decode
output bit-for-bit.

Writes one parquet per query to tests/golden/ via pyarrow with the
exact Spark schema mapped (NOT ``toPandas`` — pandas silently widens
nullable int columns to float64, corrupting values like orientation
3 -> 3.0).

Usage: python tools/make_golden.py [query ...]   (default: all)
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from gigaspark.session import get_spark  # noqa: E402

GOLDEN_QUERIES = [
    "multimodal_features",
    "image_neardup",
    "audio_features",
    "video_frames",
    "video_scene_cuts",
    "image_exif_orientation",
    "image_quality_metrics",
]

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"

_PA = {"string": pa.string(), "integer": pa.int32(), "long": pa.int64(),
       "double": pa.float64(), "boolean": pa.bool_()}


def spark_df_to_arrow(df) -> pa.Table:
    fields = [pa.field(f.name, _PA[f.dataType.typeName()])
              for f in df.schema.fields]
    schema = pa.schema(fields)
    rows = df.collect()
    cols = {f.name: [r[f.name] for r in rows] for f in df.schema.fields}
    return pa.Table.from_pydict(cols, schema=schema)


def main() -> None:
    only = set(sys.argv[1:]) or set(GOLDEN_QUERIES)
    unknown = only - set(GOLDEN_QUERIES)
    if unknown:
        raise SystemExit(f"not golden-oracle queries: {sorted(unknown)}")
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("make-golden", cores=8, shuffle_partitions=8)
    qs = E.queries()
    for name in GOLDEN_QUERIES:
        if name not in only:
            continue
        tbl = spark_df_to_arrow(qs[name](spark, "/root/testdata/sf0.001"))
        out = GOLDEN_DIR / f"{name}.parquet"
        pq.write_table(tbl, out)
        print(f"wrote {out} ({tbl.num_rows} rows)")


if __name__ == "__main__":
    main()
