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
from pyspark.sql.types import DoubleType

from gigaspark.functions.images import decode_image, psnr_db

PSNR_THRESHOLD_DB = 40.0


@F.pandas_udf(DoubleType())
def psnr_vs_golden(data: pd.Series, fmt: pd.Series, golden: pd.Series,
                   w: pd.Series, h: pd.Series) -> pd.Series:
    out = np.full(len(data), float("-inf"))
    for i in range(len(data)):
        blob, f = data.iloc[i], fmt.iloc[i]
        if blob is None or f is None or golden.iloc[i] is None:
            continue
        try:
            pix = decode_image(f, bytes(blob))
            ref = np.frombuffer(bytes(golden.iloc[i]), dtype=np.uint8).reshape(
                int(h.iloc[i]), int(w.iloc[i]), 3)
            out[i] = psnr_db(pix, ref)
        except Exception:
            out[i] = float("-inf")
    return pd.Series(out)


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
        "psnr_db",
        psnr_vs_golden(F.col("bytes"), F.col("fmt"),
                       F.col("golden_pixels"), F.col("w"), F.col("h")),
    )
    return fetched.select(
        "url", "urlhash48", "firstip", "round", "scheduled_time_ms",
        "image_id", "fmt", "w", "h", "caption", "psnr_db",
        (F.col("psnr_db") >= F.lit(PSNR_THRESHOLD_DB)).alias("pixels_ok"),
        (F.col("caption") == F.col("golden_caption")).alias("caption_ok"),
    )
