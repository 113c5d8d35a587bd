"""BMP + ICO codecs: exact roundtrips, padding, top-down, DIB/PNG payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gigaspark.functions.bmp import (
    _BMP_FILE_HDR, _BMP_INFO_HDR, decode_bmp, decode_ico, encode_bmp,
    encode_ico, encode_ico_dib)
from gigaspark.functions.images import decode_image, encode_image


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (5, 3), (1, 1), (7, 13)])
def test_bmp_roundtrip_exact(h, w):
    pix = _img(h, w)
    assert np.array_equal(decode_bmp(encode_bmp(pix)), pix)


def test_bmp_row_padding_is_4_bytes():
    pix = _img(2, 3)  # 3*3=9 bytes/row -> stride 12
    data = encode_bmp(pix)
    size = struct.unpack_from("<I", data, 34)[0]
    assert size == 2 * 12


def test_bmp_topdown_and_32bpp_decode():
    pix = _img(6, 4)
    # hand-build a top-down 32bpp BGRA BMP
    h, w = pix.shape[:2]
    bgra = np.dstack([pix[:, :, ::-1],
                      np.full((h, w), 255, np.uint8)])  # already top-down
    data = (_BMP_FILE_HDR.pack(b"BM", 14 + 40 + bgra.nbytes, 0, 0, 54)
            + _BMP_INFO_HDR.pack(40, w, -h, 1, 32, 0, bgra.nbytes,
                                 0, 0, 0, 0)
            + bgra.tobytes())
    assert np.array_equal(decode_bmp(data), pix)


def test_ico_png_and_dib_payloads():
    pix = _img(16, 16, seed=3)
    assert np.array_equal(decode_ico(encode_ico(pix)), pix)
    assert np.array_equal(decode_ico(encode_ico_dib(pix)), pix)


def test_ico_256_limit():
    with pytest.raises(ValueError):
        encode_ico(_img(8, 300))


def test_registry_dispatch():
    pix = _img(9, 9, seed=11)
    for fmt in ("bmp", "ico"):
        assert np.array_equal(decode_image(fmt, encode_image(fmt, pix)), pix)
