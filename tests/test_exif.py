"""EXIF parse/build/orientation (functions/exif.py) and the
exif_metadata operator: round-trip fidelity, both TIFF byte orders,
the eight orientation transforms, the orientation-normalized hash
story, and the corrupt-data error channel.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gigaspark.functions.exif import (apply_orientation, build_exif_tiff,
                                      insert_app1, parse_exif)
from gigaspark.functions.jpeg import decode_jpeg, encode_jpeg


def _pix(h=48, w=64):
    """Textured 8px random blocks (seeded) + corner marker: smooth
    gradients hash almost rotation-invariantly under dhash, so the
    raw-vs-normalized distinction needs real texture."""
    rng = np.random.RandomState(3)
    blocks = rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 3),
                         dtype=np.uint8)
    pix = np.kron(blocks, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w]
    pix[:8, :8] = 255
    return np.ascontiguousarray(pix)


def test_build_parse_roundtrip():
    tiff = build_exif_tiff(orientation=6, make="Acme", model="Cam 9",
                           datetime="2026:08:19 12:00:00",
                           description="test shot")
    meta = parse_exif(tiff)
    assert meta == {"orientation": 6, "make": "Acme", "model": "Cam 9",
                    "datetime": "2026:08:19 12:00:00",
                    "description": "test shot"}


def test_jpeg_app1_splice_decodes_and_parses():
    pix = _pix()
    jpg = insert_app1(encode_jpeg(pix, quality=95), build_exif_tiff(
        orientation=3, make="Acme"))
    meta = parse_exif(jpg)
    assert meta["orientation"] == 3 and meta["make"] == "Acme"
    # the spliced APPn must be transparent to the pixel decoder
    assert decode_jpeg(jpg).shape == pix.shape


def test_parse_big_endian_mm():
    """Hand-rolled MM (Motorola) TIFF: one SHORT orientation entry."""
    ifd = struct.pack(">H", 1) + struct.pack(
        ">HHI", 0x0112, 3, 1) + struct.pack(">H", 7) + b"\x00\x00"
    tiff = struct.pack(">2sHI", b"MM", 42, 8) + ifd + struct.pack(">I", 0)
    assert parse_exif(tiff)["orientation"] == 7


def test_no_exif_is_none_not_error():
    assert parse_exif(encode_jpeg(_pix(), quality=90)) is None
    from gigaspark.functions.tiff import encode_tiff
    assert parse_exif(encode_tiff(_pix())) is None  # bare pixel TIFF
    assert parse_exif(b"\x89PNG\r\n\x1a\nxxxx") is None


def test_truncated_exif_is_valueerror():
    tiff = build_exif_tiff(orientation=2, make="LongVendorName Inc.")
    with pytest.raises(ValueError):
        parse_exif(tiff[:20])
    jpg = insert_app1(encode_jpeg(_pix(), quality=90), tiff)
    with pytest.raises(ValueError):
        parse_exif(jpg[:30])


def test_orientation_transforms():
    pix = _pix(4, 6)
    assert np.array_equal(apply_orientation(pix, 1), pix)
    # flips/rot180 are involutions
    for o in (2, 3, 4):
        assert np.array_equal(
            apply_orientation(apply_orientation(pix, o), o), pix)
    # 5-8 swap the axes
    for o in (5, 6, 7, 8):
        assert apply_orientation(pix, o).shape == (6, 4, 3)
    # orientation 6 stores a 90° CCW-rotated frame; normalizing must
    # undo it: rot90(stored,3) of stored=rot90(display,1) == display
    display = pix
    stored6 = np.rot90(display, 1)
    assert np.array_equal(apply_orientation(stored6, 6), display)
    stored8 = np.rot90(display, 3)
    assert np.array_equal(apply_orientation(stored8, 8), display)
    # transpose pair
    assert np.array_equal(apply_orientation(np.swapaxes(display, 0, 1), 5),
                          display)
    with pytest.raises(ValueError):
        apply_orientation(pix, 0)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_exif_metadata_operator(spark):
    """Planted corpus: upright ori-1 and rotated ori-6 captures of the
    SAME display frame must agree on the orientation-NORMALIZED hash
    (tiny JPEG-artifact slack) while raw geometry differs; no-EXIF and
    corrupt rows take their contract paths."""
    from gigaspark.functions.phash import dhash64
    from gigaspark.operators.multimodal import exif_metadata

    display = _pix()
    up = insert_app1(encode_jpeg(display, quality=95),
                     build_exif_tiff(orientation=1, make="Acme",
                                     datetime="2026:08:19 09:00:00"))
    rot = insert_app1(encode_jpeg(np.rot90(display, 1), quality=95),
                      build_exif_tiff(orientation=6, make="Acme"))
    bare = encode_jpeg(display, quality=95)
    corrupt = insert_app1(encode_jpeg(display, quality=95),
                          build_exif_tiff(orientation=4)[:16])
    rows = [("up", up, "jpg"), ("rot", rot, "jpg"),
            ("bare", bare, "jpg"), ("corrupt", corrupt, "jpg")]
    out = {r["image_id"]: r for r in exif_metadata(
        spark.createDataFrame(
            rows, "image_id string, bytes binary, fmt string")).collect()}

    assert out["up"]["has_exif"] and out["up"]["orientation"] == 1
    assert out["up"]["taken_at"] == "2026:08:19 09:00:00"
    assert out["rot"]["orientation"] == 6
    assert (out["rot"]["w"], out["rot"]["h"]) == (48, 64)      # stored
    assert (out["rot"]["norm_w"], out["rot"]["norm_h"]) == (64, 48)
    assert _hamming(out["up"]["norm_dhash64"],
                    out["rot"]["norm_dhash64"]) <= 6
    # raw hash of the rotated capture is far from the upright one
    assert _hamming(dhash64(decode_jpeg(rot)),
                    out["up"]["norm_dhash64"]) > 10
    assert not out["bare"]["has_exif"] and out["bare"]["orientation"] == 1
    assert out["bare"]["decode_ok"]
    assert not out["corrupt"]["decode_ok"]  # corrupt EXIF = corrupt data
