"""Multimodal (image/audio/video) column plumbing for training pipelines.

Gigablast stores page payloads as opaque compressed blobs in TitleRec
(``XmlDoc::setTitleRecBuf``/``Images.cpp`` thumbnails [U][M]); the
training-data generalization is a typed binary column + metadata, with
decode / feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` transforms.

What is REAL here (tested): the Spark plumbing — schemas, batch shapes,
partitioning, the full decode path for ppm/png/qnt (functions/images.py),
baseline JPEG (the pure-numpy ITU T.81 codec in functions/jpeg.py) AND
GIF87a/89a (the pure-numpy LZW codec in functions/gif.py), pixel
statistics, and nearest-neighbour resize.  What is STUBBED (no
ffmpeg/libwebp in this container): webp decode and audio/video codecs
raise ``NotImplementedError`` through :func:`decode_stub`, clearly
marked, with the dispatch and schema ready for a vendored codec.

Scale notes: blob batches dominate memory — ``mapInPandas`` streams
Arrow batches so an executor never holds a partition of blobs at once;
keep parquet row-groups small for binary columns
(``spark.sql.files.maxPartitionBytes`` sized to blob mix) and partition
by a uniform key (image_id hash), never by host/source (skew).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gigaspark.functions.images import FORMATS, decode_image, encode_image

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("entropy_bits", T.DoubleType()),
])

RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def decode_stub(fmt: str, data: bytes) -> np.ndarray:
    """Dispatch decode; ppm/png/qnt/jpg/gif are real, webp is stubbed.

    jpg/jpeg route through the pure-numpy baseline codec
    (functions/jpeg.py); gif through the pure-numpy LZW codec
    (functions/gif.py — GIF87a/89a incl. interlace).  STUB: webp needs a
    vendored VP8 codec (none in this container, SURVEY §7.4.3) — the
    Spark-side plumbing (schema, batching, error channel) is identical
    either way.
    """
    if fmt in FORMATS or fmt in ("jpeg", "gif"):
        return decode_image(fmt, data)
    if fmt == "webp":
        raise NotImplementedError(f"codec for {fmt!r} not vendored in sandbox")
    raise ValueError(f"unknown image format {fmt!r}")


def extract_features(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → per-image pixel statistics.

    One ``mapInPandas`` pass; all pixel math is whole-array numpy.
    Decode failures surface as decode_ok=false rows, never task failures
    (a 100 TB crawl always contains corrupt blobs).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FEATURE_SCHEMA.fieldNames()}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["image_id"], row["fmt"], row["decode_ok"] = iid, fmt, False
                try:
                    pix = decode_stub(fmt, bytes(blob))
                    gray = pix.astype(np.float64).mean(axis=2)
                    hist = np.bincount(pix.reshape(-1), minlength=256)
                    pdist = hist[hist > 0] / hist.sum()
                    row.update(
                        w=int(pix.shape[1]), h=int(pix.shape[0]), decode_ok=True,
                        mean_r=float(pix[:, :, 0].mean()),
                        mean_g=float(pix[:, :, 1].mean()),
                        mean_b=float(pix[:, :, 2].mean()),
                        std_gray=float(gray.std()),
                        entropy_bits=float(-(pdist * np.log2(pdist)).sum()),
                    )
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error):
                    # decode-shaped failures only (corrupt blobs on a
                    # 100 TB crawl are data, not bugs); anything else
                    # propagates as a real task error
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, FEATURE_SCHEMA)


def resize_nn(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour thumbnail pass (Images.cpp thumbnail analogue
    [U][M]); re-encodes to the row's own format."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            ids, blobs, ws, hs, fmts = [], [], [], [], []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = decode_stub(fmt, bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                h, w, _ = pix.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                thumb = pix[yi][:, xi]
                ids.append(iid)
                blobs.append(encode_image(fmt, thumb))
                ws.append(out_w); hs.append(out_h); fmts.append(fmt)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs,
                                "w": ws, "h": hs, "fmt": fmts})

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, RESIZE_SCHEMA)


def frame_sample_stub(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB: no video codec in this container.

    The contract (schema + partitioning) is real: input (video_id,
    bytes, fmt, n_frames), output one row per sampled frame with the
    parent id, so downstream image ops apply unchanged.  Raises
    NotImplementedError inside the task for any real row.
    """

    schema = T.StructType([
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError("video codecs not vendored in sandbox")
            yield pd.DataFrame({f.name: [] for f in schema.fields})

    return videos.mapInPandas(_run, schema)
