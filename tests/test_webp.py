"""WebP VP8L lossless codec tests (gigaspark/functions/webp.py).

Round-trips cover the encoder's flat-literal path; hand-crafted VP8L
bitstreams (built with the module's own _BitWriter) cover the decoder
paths the encoder never emits: LZ77 backward references, the color
cache, and simple 2-symbol codes.  Public-spec behavior only ("WebP
Lossless Bitstream Specification"); no libwebp in this sandbox.
"""

import struct

import numpy as np
import pytest

from gigaspark.functions.webp import (
    _BitWriter, _CLC_ORDER, decode_webp, encode_webp,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------- round-trip --


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 7, 3), (5, 1, 3),
                                   (8, 8, 3), (13, 9, 3), (40, 33, 3)])
def test_roundtrip_random(shape):
    pix = _rng(sum(shape)).integers(0, 256, shape, dtype=np.uint8)
    out = decode_webp(encode_webp(pix))
    assert out.dtype == np.uint8 and out.shape == shape
    assert (out == pix).all()


def test_roundtrip_extremes():
    for val in (0, 255):
        pix = np.full((6, 10, 3), val, dtype=np.uint8)
        assert (decode_webp(encode_webp(pix)) == pix).all()
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(16, dtype=np.uint8)[None, :] * 16
    grad[:, :, 1] = np.arange(16, dtype=np.uint8)[:, None] * 16
    grad[:, :, 2] = 7
    assert (decode_webp(encode_webp(grad)) == grad).all()


def test_container_shape():
    blob = encode_webp(np.zeros((2, 3, 3), dtype=np.uint8))
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    assert blob[12:16] == b"VP8L"
    riff_len = struct.unpack("<I", blob[4:8])[0]
    assert riff_len == len(blob) - 8  # RIFF size covers 'WEBP'+chunks
    assert len(blob) % 2 == 0        # chunk padding


# ------------------------------------------------------------- error path --


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF....WEBP")          # no VP8L chunk
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\n")     # not RIFF


def test_rejects_lossy_chunk():
    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="unsupported chunk"):
        decode_webp(blob)


def test_rejects_truncated():
    blob = encode_webp(_rng(3).integers(0, 256, (8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_webp(blob[: len(blob) // 2])


# -------------------------------------------- hand-crafted decoder paths --


def _wrap_vp8l(bw: _BitWriter) -> bytes:
    body = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int, cache_bits: int = 0) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                  # alpha hint
    bw.write(0, 3)                  # version
    bw.write(0, 1)                  # no transform
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)                  # no meta-huffman


def _write_flat(bw: _BitWriter, alphabet: int, bits: int) -> None:
    """Normal code: every symbol in [0, alphabet) gets length `bits`
    (canonical ⇒ code(sym) == sym).  Incomplete Kraft is fine for the
    dict-based decoder as long as only real symbols are emitted."""
    bw.write(0, 1)                  # not simple
    lens = [0] * 19
    lens[bits] = 1
    lens[0] = 1
    bw.write(19 - 4, 4)
    for i in range(19):
        bw.write(lens[_CLC_ORDER[i]], 3)
    bw.write(1, 1)                  # use max_symbol
    bw.write(4, 3)                  # slot 4 → 10 value bits
    bw.write(alphabet - 2, 10)      # max_symbol = alphabet
    code_for_bits = 1 if lens[0] else 0   # canonical {0:'0', bits:'1'}
    for _ in range(alphabet):
        bw.write_code(code_for_bits, 1)


def _write_single(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(sym, 8)


def test_lz77_backref_decodes():
    """literal pixel + backref(len=2, dist=1) ⇒ 3 identical pixels."""
    w, h = 3, 1
    bw = _BitWriter()
    _header(bw, w, h)
    _write_flat(bw, 256 + 24, 9)    # green (covers length prefixes)
    _write_flat(bw, 256, 8)         # red
    _write_flat(bw, 256, 8)         # blue
    _write_single(bw, 255)          # alpha
    _write_single(bw, 1)            # distance code 1 → value 2 → dist 1
    r, g, b = 10, 20, 30
    bw.write_code(g, 9)
    bw.write_code(r, 8)
    bw.write_code(b, 8)
    bw.write_code(256 + 1, 9)       # length prefix code 1 → length 2
    # distance huffman is single-symbol → zero bits read for it
    pix = decode_webp(_wrap_vp8l(bw))
    assert pix.shape == (1, 3, 3)
    assert (pix == np.array([[[r, g, b]] * 3])).all()


def test_lz77_row_above_backref():
    """dist = w via plane code 1 (dx=0, dy=1): second row copies first."""
    w, h = 4, 2
    bw = _BitWriter()
    _header(bw, w, h)
    _write_flat(bw, 256 + 24, 9)
    _write_flat(bw, 256, 8)
    _write_flat(bw, 256, 8)
    _write_single(bw, 255)
    _write_single(bw, 0)            # distance code 0 → value 1 → plane(1)=w
    row = [(i, 2 * i, 3 * i) for i in range(1, w + 1)]
    for r, g, b in row:
        bw.write_code(g, 9)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
    # length 4 = prefix code 3 (value 4, no extra bits)
    bw.write_code(256 + 3, 9)
    pix = decode_webp(_wrap_vp8l(bw))
    assert (pix[1] == pix[0]).all()
    assert [tuple(int(v) for v in px) for px in pix[0]] == row


def test_color_cache_hit():
    """literal fills the cache; a cache symbol replays it exactly."""
    cache_bits = 4
    r, g, b = 200, 100, 50
    argb = (255 << 24) | (r << 16) | (g << 8) | b
    idx = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    green_size = 256 + 24 + (1 << cache_bits)
    bw = _BitWriter()
    _header(bw, 2, 1, cache_bits=cache_bits)
    _write_flat(bw, green_size, 9)
    _write_flat(bw, 256, 8)
    _write_flat(bw, 256, 8)
    _write_single(bw, 255)
    _write_single(bw, 0)
    bw.write_code(g, 9)
    bw.write_code(r, 8)
    bw.write_code(b, 8)
    bw.write_code(256 + 24 + idx, 9)   # cache hit
    pix = decode_webp(_wrap_vp8l(bw))
    assert (pix == np.array([[[r, g, b], [r, g, b]]])).all()


def test_bad_backref_rejected():
    """backref before any literal → clean ValueError, not garbage."""
    bw = _BitWriter()
    _header(bw, 2, 1)
    _write_flat(bw, 256 + 24, 9)
    _write_flat(bw, 256, 8)
    _write_flat(bw, 256, 8)
    _write_single(bw, 255)
    _write_single(bw, 1)
    bw.write_code(256 + 0, 9)       # length 1 backref at i=0
    with pytest.raises(ValueError, match="back-reference"):
        decode_webp(_wrap_vp8l(bw))


# ------------------------------------------------------- spark integration --


def test_decode_image_dispatch():
    from gigaspark.functions.images import decode_image, encode_image
    pix = _rng(9).integers(0, 256, (6, 6, 3), dtype=np.uint8)
    blob = encode_image("webp", pix)
    assert (decode_image("webp", blob) == pix).all()


def test_multimodal_webp_rows(spark):
    """real lossless webp flows decode_ok=true through mapInPandas;
    corrupt RIFF and lossy VP8 stay clean decode_ok=false misses."""
    from gigaspark.operators.multimodal import extract_features

    pix = _rng(21).integers(0, 256, (8, 12, 3), dtype=np.uint8)
    lossy = b"RIFF" + struct.pack("<I", 14) + b"WEBPVP8 " + b"\x00" * 6
    rows = [("ok", bytearray(encode_webp(pix)), "webp"),
            ("corrupt", bytearray(b"RIFF....WEBP"), "webp"),
            ("lossy", bytearray(lossy), "webp")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    feats = {r["image_id"]: r for r in extract_features(df).collect()}
    assert feats["ok"]["decode_ok"] and feats["ok"]["w"] == 12
    assert feats["corrupt"]["decode_ok"] is False
    assert feats["lossy"]["decode_ok"] is False
