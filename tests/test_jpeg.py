"""Pure-numpy baseline JPEG codec: roundtrip, spec framing, rejections."""

import struct

import numpy as np
import pytest

from gigaspark.functions.images import psnr_db
from gigaspark.functions.jpeg import decode_jpeg, encode_jpeg


def _noise(w, h, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("dims", [(8, 8), (32, 32), (31, 37), (128, 64)])
def test_roundtrip_noise_q98(dims):
    pix = _noise(*dims)
    p = psnr_db(pix, decode_jpeg(encode_jpeg(pix, quality=98)))
    assert 40.0 <= p < 60.0, p  # clears the invariant, genuinely lossy


def test_smooth_image_much_better_than_noise():
    x = np.linspace(0, 255, 64)
    smooth = np.stack([np.add.outer(x, x) / 2] * 3, axis=-1).astype(np.uint8)
    assert psnr_db(smooth, decode_jpeg(encode_jpeg(smooth, quality=90))) >= 55.0


def test_quality_monotone():
    pix = _noise(48, 48)
    p_lo = psnr_db(pix, decode_jpeg(encode_jpeg(pix, quality=50)))
    p_hi = psnr_db(pix, decode_jpeg(encode_jpeg(pix, quality=98)))
    assert p_lo < p_hi


def test_jfif_markers_present():
    blob = encode_jpeg(_noise(16, 16))
    assert blob.startswith(b"\xff\xd8\xff\xe0")  # SOI + APP0
    assert blob[6:10] == b"JFIF"
    assert blob.endswith(b"\xff\xd9")  # EOI
    assert b"\xff\xc0" in blob and b"\xff\xc4" in blob and b"\xff\xdb" in blob


def test_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"P6\n1 1\n255\nabc")


def test_rejects_lossless_sof3():
    blob = bytearray(encode_jpeg(_noise(16, 16)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3  # masquerade as lossless sequential
    with pytest.raises(ValueError, match="baseline/progressive"):
        decode_jpeg(bytes(blob))


# ------------------------------------------------------- progressive ------


def _prog_equal(pix, quality=95):
    from gigaspark.functions.jpeg import encode_jpeg_progressive
    base = decode_jpeg(encode_jpeg(pix, quality))
    prog = decode_jpeg(encode_jpeg_progressive(pix, quality))
    return np.array_equal(base, prog)


@pytest.mark.parametrize("shape,quality", [((8, 8), 95), ((16, 24), 95),
                                           ((33, 41), 90), ((64, 64), 95),
                                           ((24, 24), 50)])
def test_progressive_decodes_identical_to_baseline(shape, quality):
    """SOF2 successive approximation reconstructs the SAME quantized
    coefficient array as the baseline scan — decode equality is a
    whole-machinery gate (point transforms, refinement correction bits,
    new-coefficient insertion, EOBn runs)."""
    rng = np.random.default_rng(sum(shape) + quality)
    assert _prog_equal(rng.integers(0, 256, (*shape, 3), dtype=np.uint8),
                       quality)


def test_progressive_long_eob_runs():
    assert _prog_equal(np.full((80, 80, 3), 130, dtype=np.uint8))


def test_progressive_sparse_detail():
    """Mostly-flat with sparse detail: EOBn runs interleaved with
    refinement correction bits — the trickiest decode path."""
    sp = np.full((96, 64, 3), 100, dtype=np.uint8)
    rng = np.random.default_rng(9)
    for _ in range(25):
        y0, x0 = rng.integers(0, 90), rng.integers(0, 60)
        sp[y0:y0 + 3, x0:x0 + 3] = rng.integers(0, 256, 3)
    assert _prog_equal(sp, 92)


@pytest.mark.parametrize("sub", ["420", "422"])
@pytest.mark.parametrize("shape", [(16, 16), (24, 40), (33, 41), (17, 15),
                                   (8, 8)])
def test_subsampled_prog_equals_baseline(sub, shape):
    """4:2:0 / 4:2:2: MCU interleave order, per-component padded grids,
    and non-interleaved progressive scans over the subsampled grids all
    agree — progressive decode == baseline decode, and grey fixtures
    (chroma flat → subsampling lossless) clear the PSNR gate."""
    from gigaspark.functions.jpeg import encode_jpeg_progressive
    rng = np.random.default_rng(sum(shape))
    g = rng.integers(0, 256, shape, dtype=np.uint8)
    pix = np.stack([g, g, g], axis=-1)
    base = decode_jpeg(encode_jpeg(pix, 95, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(pix, 95, subsample=sub))
    assert np.array_equal(base, prog)
    assert psnr_db(base, pix) >= 38.0


def test_420_colorful_gradient():
    from gigaspark.functions.jpeg import encode_jpeg_progressive
    yy, xx = np.mgrid[0:48, 0:56]
    img = np.stack([xx * 255 / 55, yy * 255 / 47,
                    (xx + yy) * 255 / 102], axis=-1).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, 95, subsample="420"))
    prog = decode_jpeg(encode_jpeg_progressive(img, 95, subsample="420"))
    assert np.array_equal(base, prog)
    assert psnr_db(base, img) >= 40.0


def test_progressive_via_images_dispatch():
    from gigaspark.functions.images import decode_image, encode_image, psnr_db
    pix = _noise(24, 32)
    out = decode_image("jpgp", encode_image("jpgp", pix))
    assert psnr_db(out, pix) >= 40.0


def test_rejects_truncated_scan():
    blob = encode_jpeg(_noise(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])


def test_rejects_oversized_sampling_factor():
    # sampling factors 1-2 are supported; 4 is not — must raise, not
    # mis-decode
    blob = bytearray(encode_jpeg(_noise(16, 16)))
    i = blob.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then [cid, hv, tq]*3
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert blob[hv_off] == 0x11
    blob[hv_off] = 0x44
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(blob))


def test_byte_stuffing_roundtrip():
    # images with many max-DC blocks produce 0xFF bytes in the scan;
    # quality 98 noise at this size reliably exercises stuffing
    pix = _noise(64, 64, seed=11)
    blob = encode_jpeg(pix, quality=98)
    assert b"\xff\x00" in blob.split(b"\xff\xda")[1]  # stuffed scan bytes
    assert psnr_db(pix, decode_jpeg(blob)) >= 40.0


def test_dimension_header_roundtrip():
    blob = encode_jpeg(_noise(31, 17))
    i = blob.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", blob[i + 5:i + 9])
    assert (w, h) == (31, 17)
    assert decode_jpeg(blob).shape == (17, 31, 3)
