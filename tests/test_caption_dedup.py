"""Cross-modal image-caption dedup: phash-OR-caption pair semantics."""

from __future__ import annotations

from gigaspark.operators.dedup import image_caption_neardup


def test_pairs_by_either_signal(spark):
    # i1/i2: phash within 2 bits, captions differ -> phash-only pair
    # i1/i3: captions equal, phash far             -> caption-only pair
    # i4/i5: both signals                          -> one merged pair
    # i6: isolated
    rows = [
        ("i1", 0x0F0F0F0F0F0F0F, "a cat"),
        ("i2", 0x0F0F0F0F0F0F0C, "a dog"),          # dist 2 from i1
        ("i3", 0x3A5A5A5A5A5A5A, "a cat"),          # same caption as i1
        ("i4", 0x123456789ABCDE, "sunset beach"),
        ("i5", 0x123456789ABCDF, "sunset beach"),   # dist 1 + same caption
        ("i6", 0x2D2D2D2D2D2D2D, "nothing alike"),
    ]
    imgs = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    got = {(r["a_id"], r["b_id"]): (r["phash_dist"], r["same_caption"])
           for r in image_caption_neardup(imgs, bits=56, n_bands=7,
                                          max_dist=4).collect()}
    assert got == {
        ("i1", "i2"): (2, False),
        ("i1", "i3"): (bin(0x0F0F0F0F0F0F0F ^ 0x3A5A5A5A5A5A5A).count("1"), True),
        ("i4", "i5"): (1, True),
    }


def test_lossless_banding_at_threshold(spark):
    # dist == max_dist must still be found (pigeonhole: 4 flipped bits
    # cannot touch more than 4 of 7 bands -> >= 3 bands agree)
    rows = [("a", 0x00000000000000, "x"), ("b", 0b1011000000001000, "y")]
    imgs = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    out = image_caption_neardup(imgs, bits=56, n_bands=7, max_dist=4).collect()
    assert len(out) == 1 and out[0]["phash_dist"] == 4
    assert not out[0]["same_caption"]
