"""Image curation metrics: closed-form fixtures per metric law."""

from __future__ import annotations

import numpy as np
import pytest

from gigaspark.functions.images import encode_image
from gigaspark.functions.jpeg import encode_jpeg, estimate_jpeg_quality
from gigaspark.operators.multimodal import image_quality


def _run(spark, rows):
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {r["image_id"]: r for r in image_quality(df).collect()}


def test_flat_vs_checkerboard(spark):
    """Flat image: zero contrast/sharpness/colorfulness, brightness 128.
    Checkerboard: maximal sharpness and contrast, gray (colorless)."""
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    check = np.where(((yy + xx) % 2 == 0)[..., None], 255, 0).astype(np.uint8).repeat(3, axis=2)
    got = _run(spark, [
        ("flat", bytearray(encode_image("png", flat)), "png"),
        ("check", bytearray(encode_image("png", check)), "png"),
    ])
    f, c = got["flat"], got["check"]
    assert f["decode_ok"] and c["decode_ok"]
    assert f["brightness"] == pytest.approx(128.0)
    assert f["contrast"] == 0.0 and f["sharpness"] == 0.0
    assert f["colorfulness"] == 0.0
    # checkerboard: mean 127.5, std 127.5; Laplacian alternates ±8*127.5
    assert c["brightness"] == pytest.approx(127.5)
    assert c["contrast"] == pytest.approx(127.5)
    assert c["sharpness"] > 100000
    assert c["colorfulness"] == 0.0  # r=g=b everywhere


def test_colorfulness_red_image(spark):
    """Pure red constant image: σ terms are 0; μ_rg=255, μ_yb=127.5 →
    colorfulness = 0.3*sqrt(255² + 127.5²)."""
    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    got = _run(spark, [("red", bytearray(encode_image("png", red)), "png")])
    want = 0.3 * np.sqrt(255.0 ** 2 + 127.5 ** 2)
    assert got["red"]["colorfulness"] == pytest.approx(want)
    assert got["red"]["sharpness"] == 0.0


def test_dark_bright_fractions(spark):
    """Half-dark/half-bright split image → dark_frac = bright_frac = 0.5."""
    pix = np.zeros((16, 16, 3), dtype=np.uint8)
    pix[8:, :, :] = 255
    got = _run(spark, [("split", bytearray(encode_image("png", pix)), "png")])
    r = got["split"]
    assert r["dark_frac"] == pytest.approx(0.5)
    assert r["bright_frac"] == pytest.approx(0.5)


def test_jpeg_quality_estimate(spark):
    """DQT-derived quality lands within ±2 of the encode setting; png
    rows carry no estimate; corrupt blobs go down the error channel."""
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [(f"q{q}", bytearray(encode_jpeg(pix, quality=q)), "jpg")
            for q in (30, 50, 75, 90)]
    rows.append(("png", bytearray(encode_image("png", pix)), "png"))
    rows.append(("bad", bytearray(b"\xff\xd8garbage"), "jpg"))
    got = _run(spark, rows)
    for q in (30, 50, 75, 90):
        assert abs(got[f"q{q}"]["jpeg_quality"] - q) <= 2, q
    assert got["png"]["jpeg_quality"] is None
    assert got["bad"]["decode_ok"] is False


def test_blur_reduces_sharpness():
    """Box-blurring a noise image must cut the Laplacian variance —
    direct check of the estimator's monotonicity (numpy level)."""
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (32, 32)).astype(np.float64)
    blur = (np.roll(g, 1, 0) + np.roll(g, -1, 0) + np.roll(g, 1, 1)
            + np.roll(g, -1, 1) + g) / 5.0

    def sharp(x):
        lap = (4 * x - np.roll(x, 1, 0) - np.roll(x, -1, 0)
               - np.roll(x, 1, 1) - np.roll(x, -1, 1))[1:-1, 1:-1]
        return lap.var()

    assert sharp(blur) < sharp(g) * 0.5


def test_quality_estimator_roundtrip_range():
    rng = np.random.default_rng(13)
    pix = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for q in (15, 40, 60, 85, 95):
        est = estimate_jpeg_quality(encode_jpeg(pix, quality=q))
        assert abs(est - q) <= 4, (q, est)
    with pytest.raises(ValueError):
        estimate_jpeg_quality(b"not a jpeg")


def test_quality_estimator_skips_ff_fill_bytes():
    """T.81 B.1.1.2 fill bytes: a run of 0xFF padding before a marker
    must not shift the seg_len read or hide the DQT."""
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg(pix, quality=60)
    base = estimate_jpeg_quality(blob)
    # inject fill bytes before every marker after SOI
    out, i, n = bytearray(blob[:2]), 2, len(blob)
    dqt_seen = False
    while i + 1 < n:
        if blob[i] == 0xFF and blob[i + 1] not in (0x00, 0xFF):
            out += b"\xff\xff\xff"       # fill run, then real marker
            if blob[i + 1] == 0xDA:
                out += blob[i:]          # entropy data: stop rewriting
                break
            dqt_seen = dqt_seen or blob[i + 1] == 0xDB
        out.append(blob[i]); i += 1
    assert dqt_seen
    assert estimate_jpeg_quality(bytes(out)) == base
