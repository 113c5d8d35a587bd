"""Codec roundtrips + PSNR invariant thresholds (input_hint)."""

import numpy as np
import pytest

from gigaspark.functions.images import (
    FORMATS, LOSSLESS, decode_image, encode_image, psnr_db,
)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("dims", [(32, 32), (64, 32), (128, 64)])
def test_roundtrip(fmt, dims):
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (dims[1], dims[0], 3), dtype=np.uint8)
    back = decode_image(fmt, encode_image(fmt, pix))
    assert back.shape == pix.shape
    if fmt in LOSSLESS:
        assert (back == pix).all()
        assert psnr_db(back, pix) == float("inf")
    else:
        p = psnr_db(back, pix)
        assert p >= 40.0, f"lossy {fmt} must clear the 40dB invariant, got {p}"
        assert p < 60.0  # genuinely lossy, not accidentally exact


def test_psnr_detects_corruption():
    rng = np.random.default_rng(8)
    pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert psnr_db(pix, other) < 40.0
    assert psnr_db(pix, np.zeros((16, 16, 3), np.uint8)) == float("-inf")
