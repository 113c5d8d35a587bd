"""Area-mean resize: exact box semantics + the Spark thumbnail pass."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gigaspark.functions.images import area_resize_rgb, encode_image, decode_image


def test_integer_factor_box_mean_exact():
    # 4x4 -> 2x2 with known window means
    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    pix[0:2, 0:2] = 100
    pix[0:2, 2:4] = 200
    pix[2:4, 0:2] = 40
    pix[2:4, 2:4] = 240
    out = area_resize_rgb(pix, 2, 2)
    assert out[0, 0, 0] == 100 and out[0, 1, 0] == 200
    assert out[1, 0, 0] == 40 and out[1, 1, 0] == 240


def test_solid_color_invariant_any_scale():
    pix = np.full((7, 13, 3), 123, dtype=np.uint8)
    for w, h in ((3, 3), (20, 5), (1, 1), (13, 7)):
        out = area_resize_rgb(pix, w, h)
        assert out.shape == (h, w, 3)
        assert np.all(out == 123)


def test_mean_preserved_on_downscale():
    rng = np.random.default_rng(4)
    pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = area_resize_rgb(pix, 8, 8)
    # global mean preserved to rounding error
    assert abs(float(out.mean()) - float(pix.mean())) < 1.0


def test_spark_resize_area_pass(spark):
    rng = np.random.default_rng(6)
    rows = []
    for i in range(12):
        pix = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        fmt = ("png", "bmp", "tiff")[i % 3]
        rows.append((f"img{i}", bytearray(encode_image(fmt, pix)), fmt))
    images = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")

    from gigaspark.operators.multimodal import resize_area

    out = resize_area(images, 8, 8).collect()
    assert len(out) == 12
    for r in out:
        assert (r["w"], r["h"]) == (8, 8)
        pix = decode_image(r["fmt"], bytes(r["bytes"]))
        assert pix.shape == (8, 8, 3)
