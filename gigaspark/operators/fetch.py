"""Simulated fetch + per-row payload validation (SURVEY S4, J8, C8).

Reference: ``Msg13.cpp::getHttpDoc`` fetches pages; ``XmlDoc`` stores a
compressed TitleRec blob [U][H].  The graft has no network: "fetching" a
scheduled URL means joining it to its payload row (page_image → images)
— the join IS the simulated WAN hop.  The per-row invariant
(BASELINE.json input_hint) is validated here: decoded fetched bytes vs
golden pixels (exact for lossless ppm/png, PSNR ≥ 40 dB for lossy qnt)
and exact caption equality.

Decode runs in ONE Arrow-batched pandas UDF (variable-shaped binary
payloads are inherently per-element, but batching, transfer, and all
pixel math are vectorized — no row-at-a-time Python UDF registration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from gigaspark.functions.images import decode_image, psnr_db
from gigaspark.functions.phash import dhash64

PSNR_THRESHOLD_DB = 40.0

_VALIDATE_T = StructType([StructField("psnr_db", DoubleType()),
                          StructField("dhash", LongType())])


@F.pandas_udf(_VALIDATE_T)
def psnr_vs_golden(data: pd.Series, fmt: pd.Series, golden: pd.Series,
                   w: pd.Series, h: pd.Series) -> pd.DataFrame:
    """One decode per row → (PSNR vs golden pixels, perceptual dHash64
    of the DECODED pixels) — the dhash must match the table's stored
    phash column (input_hint) exactly for lossless formats, within a
    small hamming budget for lossy ones (measured worst drift: qnt 2
    bits, jpg 1 at PSNR≥40dB), catching payload swaps independently of
    the golden-pixel sidecar."""
    out_psnr = np.full(len(data), float("-inf"))
    out_hash = np.zeros(len(data), dtype=np.int64)
    for i in range(len(data)):
        blob, f = data.iloc[i], fmt.iloc[i]
        if blob is None or f is None or golden.iloc[i] is None:
            continue
        try:
            pix = decode_image(f, bytes(blob))
            ref = np.frombuffer(bytes(golden.iloc[i]), dtype=np.uint8).reshape(
                int(h.iloc[i]), int(w.iloc[i]), 3)
            out_psnr[i] = psnr_db(pix, ref)
            out_hash[i] = dhash64(pix)
        except Exception:
            out_psnr[i] = float("-inf")
    return pd.DataFrame({"psnr_db": out_psnr, "dhash": out_hash})

LOSSLESS_FMTS = ("ppm", "png", "gif", "webp")
PHASH_DIST_BUDGET = 4  # lossy formats; lossless must match exactly


def validate_fetch(emitted: DataFrame, page_image: DataFrame,
                   images: DataFrame, images_golden: DataFrame) -> DataFrame:
    """emitted schedule → fetched + validated payload rows.

    Join strategy: page_image is keyed by src_url (big at scale → shuffle
    equi-join, uniform keys); images/images_golden are dimension-like →
    broadcast when small, AQE decides otherwise.
    """
    fetched = (
        emitted.join(page_image, emitted["url"] == page_image["src_url"], "left")
        .drop("src_url")
        .join(images, "image_id", "left")
        .join(
            images_golden.select(
                "image_id",
                F.col("pixels").alias("golden_pixels"),
                F.col("caption").alias("golden_caption"),
            ),
            "image_id",
            "left",
        )
    )
    fetched = fetched.withColumn(
        "_v",
        psnr_vs_golden(F.col("bytes"), F.col("fmt"),
                       F.col("golden_pixels"), F.col("w"), F.col("h")),
    ).withColumn(
        "phash_dist",
        F.bit_count(F.col("_v.dhash").bitwiseXOR(F.col("phash"))).cast("int"),
    )
    return fetched.select(
        "url", "urlhash48", "firstip", "round", "scheduled_time_ms",
        "image_id", "fmt", "w", "h", "caption",
        F.col("_v.psnr_db").alias("psnr_db"), "phash_dist",
        (F.col("_v.psnr_db") >= F.lit(PSNR_THRESHOLD_DB)).alias("pixels_ok"),
        (F.col("caption") == F.col("golden_caption")).alias("caption_ok"),
        F.when(F.col("fmt").isin(*LOSSLESS_FMTS), F.col("phash_dist") == 0)
        .otherwise(F.col("phash_dist") <= PHASH_DIST_BUDGET)
        .alias("phash_ok"),
    )
