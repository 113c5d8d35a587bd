"""Full-coverage PNG codec tests (gigaspark/functions/png.py).

Roundtrips exercise the encoder's modes (adaptive filters, palette,
gray, Adam7); hand-crafted streams (built with the module's own chunk
writer) cover the decoder paths the encoder never emits: RGBA,
gray+alpha, sub-byte depths, 16-bit, color-key/palette tRNS, and each
individual filter type.  Public PNG spec only; no libpng in sandbox.
"""

import struct
import zlib

import numpy as np
import pytest

from gigaspark.functions.png import _SIG, _chunk, decode_png, encode_png


def _rng(seed=0):
    return np.random.default_rng(seed)


def _build(w, h, depth, ctype, raw_rows, plte=None, trns=None,
           interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = bytearray(_SIG) + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw_rows, 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


# ---------------------------------------------------------- roundtrips ----


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (33, 41), (1, 9), (9, 1)])
@pytest.mark.parametrize("interlace", [False, True])
def test_rgb_roundtrip(shape, interlace):
    pix = _rng(sum(shape)).integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(pix, interlace=interlace)),
                          pix)


def test_adaptive_filters_compress_gradients():
    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.stack([xx * 4 % 256, yy * 4 % 256, (xx + yy) * 2 % 256],
                    axis=-1).astype(np.uint8)
    a = encode_png(grad, adaptive=True)
    z = encode_png(grad, adaptive=False)
    assert np.array_equal(decode_png(a), grad)
    assert np.array_equal(decode_png(z), grad)
    assert len(a) < len(z) // 4       # Sub/Up filters flatten gradients


@pytest.mark.parametrize("interlace", [False, True])
def test_palette_and_gray_roundtrip(interlace):
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   dtype=np.uint8)
    idx = _rng(1).integers(0, 4, (25, 17))
    pix = pal[idx]
    assert np.array_equal(
        decode_png(encode_png(pix, palette=True, interlace=interlace)), pix)
    g = _rng(2).integers(0, 256, (21, 19), dtype=np.uint8)
    gp = np.stack([g, g, g], axis=-1)
    assert np.array_equal(
        decode_png(encode_png(gp, gray=True, interlace=interlace)), gp)


def test_palette_mode_rejects_truecolor():
    with pytest.raises(ValueError, match="palette"):
        encode_png(_rng(3).integers(0, 256, (32, 32, 3), dtype=np.uint8),
                   palette=True)


# ---------------------------------------------------- decoder-only paths --


def _rows(pix_bytes, h, rowbytes, filters=None):
    """Assemble filter-byte-prefixed scanlines."""
    out = bytearray()
    for y in range(h):
        out.append(0 if filters is None else filters[y])
        out += pix_bytes[y * rowbytes:(y + 1) * rowbytes]
    return bytes(out)


def test_each_filter_type_decodes():
    """One image per filter type, filtered by hand per the spec."""
    pix = _rng(4).integers(0, 256, (6, 5, 3), dtype=np.uint8).astype(np.int32)
    flat = pix.reshape(6, 15)
    for ft in range(5):
        raw = bytearray()
        prev = np.zeros(15, dtype=np.int32)
        for y in range(6):
            cur = flat[y]
            a = np.zeros(15, dtype=np.int32)
            a[3:] = cur[:-3]
            c = np.zeros(15, dtype=np.int32)
            c[3:] = prev[:-3]
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = (cur - a) & 0xFF
            elif ft == 2:
                enc = (cur - prev) & 0xFF
            elif ft == 3:
                enc = (cur - ((a + prev) >> 1)) & 0xFF
            else:
                def paeth(aa, bb, cc):
                    p = aa + bb - cc
                    pa, pb, pc = abs(p - aa), abs(p - bb), abs(p - cc)
                    return aa if pa <= pb and pa <= pc else (bb if pb <= pc else cc)
                enc = np.array([(int(cur[i]) - paeth(int(a[i]), int(prev[i]),
                                                     int(c[i]))) & 0xFF
                                for i in range(15)])
            raw.append(ft)
            raw += bytes(enc.astype(np.uint8).tolist())
            prev = cur
        blob = _build(5, 6, 8, 2, bytes(raw))
        assert np.array_equal(decode_png(blob), pix.astype(np.uint8)), ft


def test_rgba_composites_over_white():
    # 1x2: opaque red, half-transparent blue
    raw = _rows(bytes([255, 0, 0, 255, 0, 0, 255, 128]), 1, 8)
    out = decode_png(_build(2, 1, 8, 6, raw))
    assert out.shape == (1, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    b = out[0, 1]
    assert b[2] > 180 and b[0] == b[1] and 120 <= b[0] <= 135  # blue on white


def test_gray_alpha():
    raw = _rows(bytes([100, 255, 200, 0]), 1, 4)
    out = decode_png(_build(2, 1, 8, 4, raw))
    assert tuple(out[0, 0]) == (100, 100, 100)
    assert tuple(out[0, 1]) == (255, 255, 255)   # fully transparent → white


@pytest.mark.parametrize("depth,vals,expect", [
    (1, [0b01011000], [0, 255, 0, 255, 255, 0]),
    (2, [0b00011011, 0b11000000], [0, 85, 170, 255, 255, 0]),
    (4, [0x0F, 0x73, 0xA0], [0, 255, 119, 51, 170, 0]),
])
def test_subbyte_gray_depths(depth, vals, expect):
    w = 6
    raw = _rows(bytes(vals), 1, len(vals))
    out = decode_png(_build(w, 1, depth, 0, raw))
    assert out.shape == (1, w, 3)
    assert [int(v) for v in out[0, :, 0]] == expect


def test_16bit_truecolor():
    # two pixels, 16-bit samples: high byte is rendered
    px = struct.pack(">HHHHHH", 0xFF00, 0x0100, 0x8000, 0x0000, 0xFFFF, 0x7F00)
    raw = _rows(px, 1, 12)
    out = decode_png(_build(2, 1, 16, 2, raw))
    assert tuple(out[0, 0]) == (0xFF, 0x01, 0x80)
    assert tuple(out[0, 1]) == (0x00, 0xFF, 0x7F)


def test_palette_trns():
    plte = bytes([255, 0, 0, 0, 0, 255])
    raw = _rows(bytes([0, 1]), 1, 2)
    out = decode_png(_build(2, 1, 8, 3, raw, plte=plte, trns=bytes([255, 0])))
    assert tuple(out[0, 0]) == (255, 0, 0)       # opaque red
    assert tuple(out[0, 1]) == (255, 255, 255)   # transparent → white


def test_subbyte_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    # depth 2, five pixels: 00 01 10 11 00 (packed MSB-first) + pad
    raw = _rows(bytes([0b00011011, 0b00000000]), 1, 2)
    out = decode_png(_build(5, 1, 2, 3, raw, plte=plte))
    assert [tuple(p) for p in out[0]] == [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9), (255, 0, 0)]


# --------------------------------------------------------------- errors ---


def test_error_paths():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    pix = _rng(5).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = bytearray(encode_png(pix))
    with pytest.raises(ValueError):              # truncated IDAT
        decode_png(bytes(blob[:40]) + _chunk(b"IEND", b""))
    raw = _rows(bytes([1, 2, 3] * 2), 1, 6, filters=[7])
    with pytest.raises(ValueError, match="filter"):
        decode_png(_build(2, 1, 8, 2, raw))
    raw = _rows(bytes([5]), 1, 1)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_build(1, 1, 8, 3, raw))      # palette without PLTE
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_build(1, 1, 8, 3, raw, plte=bytes([1, 2, 3])))


def test_images_dispatch_regression():
    from gigaspark.functions.images import decode_image, encode_image
    pix = _rng(6).integers(0, 256, (12, 12, 3), dtype=np.uint8)
    assert np.array_equal(decode_image("png", encode_image("png", pix)), pix)
