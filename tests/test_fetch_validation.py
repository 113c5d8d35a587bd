"""Simulated fetch + per-row payload invariant (SURVEY S4/J8/C8;
BASELINE.json input_hint): every fetched URL joins to its image payload,
decoded pixels match golden (exact for lossless, PSNR ≥ 40 dB for lossy),
captions equal exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gigaspark.operators.fetch import PSNR_THRESHOLD_DB, validate_fetch
from gigaspark.operators.frontier import CrawlConfig, CrawlScheduler
from tests.conftest import load_fixtures


def test_fetch_validation_on_micro(spark, micro_dir):
    fx = load_fixtures(spark, micro_dir)
    sched = CrawlScheduler(spark, fx, CrawlConfig(validate_fetch=True))
    sched.seed(spark.read.parquet(f"{micro_dir}/seeds.parquet"))
    for _ in range(3):
        sched.run_round()
    fetched = sched.fetched_df()
    assert fetched is not None
    rows = fetched.collect()
    assert len(rows) > 10
    with_payload = [r for r in rows if r["image_id"] is not None]
    assert with_payload, "no URL mapped to a payload image"
    for r in with_payload:
        assert r["pixels_ok"], f"PSNR {r['psnr_db']} < {PSNR_THRESHOLD_DB} for {r['url']}"
        assert r["caption_ok"], f"caption mismatch for {r['url']}"
    # lossy qnt rows must be genuinely lossy (finite PSNR) yet >= 40 dB
    lossy = [r for r in with_payload if r["fmt"] == "qnt"]
    if lossy:
        assert all(PSNR_THRESHOLD_DB <= r["psnr_db"] < float("inf") for r in lossy)
    lossless = [r for r in with_payload if r["fmt"] in ("ppm", "png")]
    if lossless:
        assert all(r["psnr_db"] == float("inf") for r in lossless)


def test_validate_fetch_flags_corruption(spark, micro_dir):
    """Corrupted golden pixels must fail the invariant, not pass silently."""
    fx = load_fixtures(spark, micro_dir)
    emitted = spark.createDataFrame(
        [("http://host1.example/p/0", 1, 1, 0, 0)],
        "url string, urlhash48 long, firstip int, round int, scheduled_time_ms long")
    pi = fx["page_image"].where(F.col("src_url") == "http://host1.example/p/0")
    first_img = pi.collect()
    if not first_img:
        pytest.skip("no payload for that url in this universe")
    bad_golden = fx["images_golden"].withColumn(
        "pixels", F.expr("substring(pixels, 1, 8)"))  # truncated → decode-shape fail
    out = validate_fetch(emitted, fx["page_image"], fx["images"], bad_golden).collect()
    assert out and all(not r["pixels_ok"] for r in out if r["image_id"] is not None)
