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


def test_line_dedup_boilerplate(spark):
    """Footer shared by 6 docs of one domain is removed; a doc that is
    ALL boilerplate comes back empty; order of kept lines preserved;
    the same footer on another domain (below threshold) survives."""
    from gigaspark.operators.dedup import line_dedup

    rows = [(i, "a.com", f"unique {i}\nshared footer\ntail {i}")
            for i in range(6)]
    rows.append((6, "a.com", "shared footer"))
    rows.append((7, "b.com", "unique 7\nshared footer"))
    docs = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    got = {r["doc_id"]: r for r in line_dedup(docs, max_df=5).collect()}
    for i in range(6):
        assert got[i]["clean_text"] == f"unique {i}\ntail {i}"
        assert got[i]["n_lines"] == 3 and got[i]["n_removed"] == 1
    assert got[6]["clean_text"] == "" and got[6]["n_removed"] == 1
    # b.com's copy of the footer has df=1 there → kept
    assert got[7]["clean_text"] == "unique 7\nshared footer"
