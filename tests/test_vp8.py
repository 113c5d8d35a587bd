"""Lossy VP8 (WebP 'VP8 ' chunk) codec tests (gigaspark/functions/vp8.py).

RFC 6386-shaped keyframe codec with repo-pinned probability/quant
tables (see the module header).  The encoder runs the decoder's closed
reconstruction loop, so any enc/dec disagreement in prediction, token
contexts, transforms, or the bool coder destroys PSNR — roundtrip PSNR
is therefore a whole-pipeline correctness gate, not just a quality
number.  No libwebp in this sandbox.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gigaspark.functions import vp8
from gigaspark.functions.images import psnr_db
from gigaspark.functions.webp import decode_webp


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 / max(w - 1, 1),
        yy * 255 / max(h - 1, 1),
        (xx + yy) * 255 / max(w + h - 2, 1),
    ], axis=-1).astype(np.uint8)


def _roundtrip(img, **kw):
    return decode_webp(vp8.encode_webp_lossy(img, **kw))


# ------------------------------------------------------------ bool coder --


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(1, 254)),
                min_size=1, max_size=600))
def test_bool_coder_roundtrip(seq):
    enc = vp8.BoolEncoder()
    for bit, p in seq:
        enc.encode(bit, p)
    dec = vp8.BoolDecoder(enc.finish())
    assert [dec.decode(p) for _, p in seq] == [b for b, _ in seq]


def test_bool_coder_literals():
    enc = vp8.BoolEncoder()
    for v, n in ((0, 1), (127, 7), (255, 8), (12345, 14)):
        enc.literal(v, n)
    dec = vp8.BoolDecoder(enc.finish())
    assert [dec.literal(n) for n in (1, 7, 8, 14)] == [0, 127, 255, 12345]


# ------------------------------------------------------------ transforms --


def test_dct_wht_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        res = rng.integers(-255, 256, (4, 4))
        assert np.abs(vp8.idct4x4(vp8.fdct4x4(res)) - res).max() <= 2
        assert np.abs(vp8.iwht4x4(vp8.fwht4x4(res)) - res).max() <= 2


def test_quantized_coeffs_stay_in_token_range():
    """Worst-case residual through fdct/fwht at the smallest quantizer
    must fit the cat6 cap — the invariant the q-lookup minimum of 4
    exists for."""
    q = vp8.quant_factors(0)
    worst = np.full((4, 4), 255, dtype=np.int64)
    co = vp8.fdct4x4(worst)
    assert np.abs(vp8._quantize(co, q["ydc"], q["yac"])).max() <= vp8.MAX_COEFF
    dcs = np.full((4, 4), np.abs(co).max(), dtype=np.int64)
    y2 = vp8.fwht4x4(dcs)
    assert np.abs(vp8._quantize(y2, q["y2dc"], q["y2ac"])).max() <= vp8.MAX_COEFF


# -------------------------------------------------------------- frames ----


@pytest.mark.parametrize("ymode", ["DC", "V", "H", "TM", "B"])
def test_roundtrip_modes_gradient(ymode):
    img = _gradient(48, 64)
    out = _roundtrip(img, qi=0, ymode=ymode)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert psnr_db(out, img) >= 40.0      # the lossy-format invariant


@pytest.mark.parametrize("bmode", vp8.BMODES)
def test_all_bpred_submodes(bmode):
    img = _gradient(37, 53)               # odd dims: edge MBs exercised
    out = _roundtrip(img, qi=4, ymode="B", bmode=bmode, uvmode="TM")
    assert out.shape == img.shape
    assert psnr_db(out, img) >= 35.0


def test_grey_noise_high_psnr():
    """No chroma -> 4:2:0 is lossless there; qi=0 luma error is pure
    quant+idct rounding."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    assert psnr_db(_roundtrip(img, qi=0), img) >= 45.0


def test_rate_falls_with_qi():
    img = _gradient(48, 48)
    sizes = [len(vp8.encode_webp_lossy(img, qi=qi)) for qi in (0, 8, 24, 60)]
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[-1] < sizes[0] / 2


@pytest.mark.parametrize("shape", [(1, 1), (4, 4), (16, 16), (17, 1),
                                   (1, 33), (15, 18)])
def test_small_and_ragged_dims(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    g = rng.integers(0, 256, shape, dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    out = _roundtrip(img, qi=0)
    assert out.shape == img.shape
    assert psnr_db(out, img) >= 40.0


def test_chroma_modes_decode():
    img = _gradient(32, 32)
    for uvmode in vp8.YMODES:
        out = _roundtrip(img, qi=2, uvmode=uvmode)
        assert psnr_db(out, img) >= 35.0


# ------------------------------------------------------------- errors -----


def test_error_paths():
    img = _gradient(16, 16)
    blob = bytearray(vp8.encode_webp_lossy(img, qi=0))
    payload_off = 20
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(b"\x00" * 4)          # truncated
    bad = bytearray(blob[payload_off:])
    bad[0] |= 1                                     # interframe flag
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(bytes(bad))
    bad = bytearray(blob[payload_off:])
    bad[3] = 0x00                                   # start code
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(bytes(bad))
    with pytest.raises(ValueError):
        vp8.encode_vp8_frame(np.zeros((4, 4), dtype=np.uint8))   # not RGB
    with pytest.raises(ValueError):
        vp8.encode_vp8_frame(_gradient(8, 8), ymode="nope")


def test_container_dispatch():
    """decode_webp routes VP8 chunks here and VP8L to the lossless
    decoder; VP8X still raises."""
    img = _gradient(24, 24)
    assert decode_webp(vp8.encode_webp_lossy(img, qi=0)).shape == img.shape
    from gigaspark.functions.webp import encode_webp
    assert (decode_webp(encode_webp(img)) == img).all()
    import struct
    fake = (b"RIFF" + struct.pack("<I", 14) + b"WEBP"
            + b"VP8X" + struct.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(ValueError):
        decode_webp(fake)
