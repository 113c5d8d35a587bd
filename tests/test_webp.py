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


def test_lossy_chunk_dispatches_to_vp8():
    """'VP8 ' chunks now route to functions/vp8.py (garbage payload
    still raises there); VP8X remains unsupported."""
    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="vp8"):
        decode_webp(blob)
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
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


# ------------------------------------------------------------- transforms --


def test_subtract_green_roundtrip():
    """encoder emits transform type 2; decoder inverts it."""
    pix = _rng(31).integers(0, 256, (9, 14, 3), dtype=np.uint8)
    blob = encode_webp(pix, subtract_green=True)
    plain = encode_webp(pix)
    assert blob != plain
    assert (decode_webp(blob) == pix).all()


def _sub_image_single(bw: _BitWriter, r=0, g=0, b=0, a=0) -> None:
    """Entropy-coded 1x1 sub-image where every channel is a 1-symbol
    code (zero pixel bits follow)."""
    bw.write(0, 1)                  # no color cache
    bw.write(0, 1)                  # no meta-huffman
    _write_single(bw, g)            # green
    _write_single(bw, r)            # red
    _write_single(bw, b)            # blue
    _write_single(bw, a)            # alpha
    _write_single(bw, 0)            # distance


def _emit_main_flat(bw: _BitWriter, rgba: np.ndarray) -> None:
    """Main image with flat G/R/B/A codes; rgba is (n, 4) residuals."""
    bw.write(0, 1)                  # no color cache
    bw.write(0, 1)                  # no meta-huffman
    _write_flat(bw, 256 + 24, 9)    # green
    _write_flat(bw, 256, 8)         # red
    _write_flat(bw, 256, 8)         # blue
    _write_flat(bw, 256, 8)         # alpha
    _write_single(bw, 0)            # distance
    for r, g, b, a in rgba:
        bw.write_code(int(g), 9)
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
        bw.write_code(int(a), 8)


def _forward_predict(pix4: np.ndarray, w: int, h: int, mode: int) -> np.ndarray:
    """Reference forward predictor (mirrors the decoder's border rules
    and flat TR addressing) → residuals mod 256."""
    from gigaspark.functions.webp import (
        _avg2, _clamp_add_sub_full, _clamp_add_sub_half, _select,
    )
    res = np.zeros_like(pix4)
    out = pix4.astype(np.int32)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (0, 0, 0, 255)
            elif y == 0:
                pred = tuple(out[i - 1])
            elif x == 0:
                pred = tuple(out[i - w])
            else:
                L, T = out[i - 1], out[i - w]
                TL, TR = out[i - w - 1], out[i - w + 1]
                pred = {
                    0: (0, 0, 0, 255), 1: tuple(L), 2: tuple(T),
                    3: tuple(TR), 4: tuple(TL),
                    5: _avg2(_avg2(L, TR), T), 6: _avg2(L, TL),
                    7: _avg2(L, T), 8: _avg2(TL, T), 9: _avg2(T, TR),
                    10: _avg2(_avg2(L, TL), _avg2(T, TR)),
                    11: _select(L, T, TL),
                    12: _clamp_add_sub_full(L, T, TL),
                    13: _clamp_add_sub_half(_avg2(L, T), TL),
                }[mode]
            res[i] = [(int(v) - int(p)) & 0xFF for v, p in zip(out[i], pred)]
    return res


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_all_modes(mode):
    """single-block predictor image, every mode: forward residuals
    crafted in-test decode back to the original pixels."""
    w, h = 7, 5
    pix = _rng(100 + mode).integers(0, 256, (h, w, 3), dtype=np.uint8)
    pix4 = np.concatenate(
        [pix.reshape(-1, 3), np.full((w * h, 1), 255, np.uint8)], axis=1)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)                  # transform present
    bw.write(0, 2)                  # type 0 = predictor
    bw.write(2, 3)                  # size_bits = 4 → 16-px blocks (1 block)
    _sub_image_single(bw, g=mode)   # predictor mode image
    bw.write(0, 1)                  # no more transforms
    _emit_main_flat(bw, _forward_predict(pix4, w, h, mode))
    out = decode_webp(_wrap_vp8l(bw))
    assert (out == pix).all(), f"mode {mode}"


def test_color_transform():
    """constant cross-channel multipliers: forward-transformed pixels
    decode back exactly (3.5-bit fixed point, int8 semantics)."""
    g2r, g2b, r2b = 0x25, 0xE0, 0x11   # mixed signs as int8
    w, h = 6, 4
    pix = _rng(55).integers(0, 256, (h, w, 3), dtype=np.uint8)
    flat = pix.reshape(-1, 3).astype(np.int32)

    def delta(t, c):
        t8 = t - 256 if t >= 128 else t
        c8 = np.where(c >= 128, c - 256, c)
        return (t8 * c8) >> 5

    r, g, b = flat[:, 0], flat[:, 1], flat[:, 2]
    r_st = (r - delta(g2r, g)) & 0xFF
    b_st = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
    rgba = np.stack([r_st, g, b_st, np.full_like(g, 255)], axis=1)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)                  # type 1 = color transform
    bw.write(2, 3)                  # size_bits = 4 → one block
    # cte packing (libwebp ColorCodeToMultipliers): blue=g2r, green=g2b, red=r2b
    _sub_image_single(bw, r=r2b, g=g2b, b=g2r, a=0)
    bw.write(0, 1)
    _emit_main_flat(bw, rgba)
    out = decode_webp(_wrap_vp8l(bw))
    assert (out == pix).all()


def test_palette_transform_with_bundling():
    """4-color palette (width_bits=2, 4 indices/byte), delta-coded
    entries, sub-byte bundling unpack."""
    colors = np.array([[10, 20, 30], [200, 100, 0],
                       [0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    w, h = 10, 3
    idx = _rng(77).integers(0, 4, (h, w), dtype=np.uint8)
    pix = colors[idx]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)                  # type 3 = color indexing
    bw.write(4 - 1, 8)              # n_colors = 4
    # palette as 4x1 entropy image, channel-wise delta-coded, alpha 255
    pal4 = np.concatenate(
        [colors, np.full((4, 1), 255, np.uint8)], axis=1).astype(np.int32)
    deltas = pal4.copy()
    deltas[1:] = (pal4[1:] - pal4[:-1]) & 0xFF
    _emit_main_flat(bw, deltas)     # palette sub-image (flat codes ok)
    bw.write(0, 1)                  # no more transforms
    # bundled main image: width_bits=2 → 2 bits/index, 4 per byte
    packed_w = (w + 3) // 4
    packed = np.zeros((h, packed_w), dtype=np.int32)
    for x in range(w):
        packed[:, x // 4] |= idx[:, x].astype(np.int32) << (2 * (x % 4))
    rgba = np.zeros((h * packed_w, 4), dtype=np.int32)
    rgba[:, 1] = packed.reshape(-1)
    rgba[:, 3] = 0
    _emit_main_flat(bw, rgba)
    out = decode_webp(_wrap_vp8l(bw))
    assert (out == pix).all()


def test_chained_subtract_green_then_predictor():
    """two transforms in one stream: read order [predictor,
    subtract-green] ⇒ inverse applies subtract-green first, then
    predictor (reverse read order) — matches a forward pipeline of
    subtract-green THEN predict."""
    w, h = 5, 4
    pix = _rng(88).integers(0, 256, (h, w, 3), dtype=np.uint8)
    flat = pix.reshape(-1, 3).astype(np.int32)
    sg = flat.copy()
    sg[:, 0] = (sg[:, 0] - sg[:, 1]) & 0xFF
    sg[:, 2] = (sg[:, 2] - sg[:, 1]) & 0xFF
    sg4 = np.concatenate(
        [sg, np.full((w * h, 1), 255, np.int32)], axis=1).astype(np.uint8)
    res = _forward_predict(sg4, w, h, mode=1)   # predict-left over SG plane

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)                  # predictor (read first → applied last)
    bw.write(2, 3)
    _sub_image_single(bw, g=1)
    bw.write(1, 1)
    bw.write(2, 2)                  # subtract-green
    bw.write(0, 1)
    _emit_main_flat(bw, res)
    out = decode_webp(_wrap_vp8l(bw))
    assert (out == pix).all()


def test_meta_huffman_two_groups():
    """entropy image splits an 8x1 row into two 4-px blocks with
    different Huffman groups: group 0 = flat literal codes, group 1 =
    all-single-symbol codes (a constant pixel, zero bits each)."""
    w, h = 8, 1
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)                  # no transforms
    bw.write(0, 1)                  # no color cache
    bw.write(1, 1)                  # meta-huffman present
    bw.write(0, 3)                  # meta_bits = 2 → 4-px blocks, meta_w=2
    # --- entropy (meta) image, 2x1: group ids 0 then 1 in green ---
    bw.write(0, 1)                  # meta image: no cache
    bw.write(0, 1)                  # meta image: no nested meta
    _write_flat(bw, 256 + 24, 9)    # green
    _write_single(bw, 0)            # red (group id high byte = 0)
    _write_single(bw, 0)            # blue
    _write_single(bw, 0)            # alpha
    _write_single(bw, 0)            # distance
    bw.write_code(0, 9)             # block 0 → group 0
    bw.write_code(1, 9)             # block 1 → group 1
    # --- group 0: flat codes ---
    _write_flat(bw, 256 + 24, 9)
    _write_flat(bw, 256, 8)
    _write_flat(bw, 256, 8)
    _write_single(bw, 255)
    _write_single(bw, 0)
    # --- group 1: constant pixel via 1-symbol codes ---
    _write_single(bw, 77)           # green
    _write_single(bw, 200)          # red
    _write_single(bw, 10)           # blue
    _write_single(bw, 255)          # alpha
    _write_single(bw, 0)            # distance
    # --- pixels: 4 literals through group 0, 4 zero-bit through group 1
    first = [(i + 1, 50 + i, 100 + i) for i in range(4)]
    for r, g, b in first:
        bw.write_code(g, 9)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
    pix = decode_webp(_wrap_vp8l(bw))
    assert [tuple(int(v) for v in p) for p in pix[0, :4]] == first
    assert (pix[0, 4:] == np.array([200, 77, 10])).all()


# ------------------------------------------------------- entropy encoder --


def test_encoder_compresses_skewed_data():
    """frequency-based Huffman beats flat 8-bit on skewed channels."""
    const = np.full((32, 32, 3), 77, dtype=np.uint8)
    assert len(encode_webp(const)) < 100           # ≈ header + tables
    grad = np.zeros((64, 64, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(64, dtype=np.uint8)[None, :] * 4
    grad[:, :, 1] = grad[:, :, 0] + 3
    grad[:, :, 2] = np.arange(64, dtype=np.uint8)[:, None] * 2
    plain = encode_webp(grad)
    sg = encode_webp(grad, subtract_green=True)
    assert len(sg) < len(plain) < 64 * 64 * 3      # < 24 bpp raw
    assert (decode_webp(plain) == grad).all()
    assert (decode_webp(sg) == grad).all()


def test_encoder_two_color_simple_codes():
    two = np.zeros((16, 16, 3), dtype=np.uint8)
    two[::2] = 255
    blob = encode_webp(two)
    assert (decode_webp(blob) == two).all()
    assert len(blob) < 200


def test_pm_lengths_kraft_and_limit():
    from gigaspark.functions.webp import _pm_lengths
    rng = np.random.default_rng(5)
    for _ in range(20):
        freqs = rng.integers(0, 1000, 300)
        freqs[rng.integers(0, 300, 100)] = 0
        L = int(rng.integers(9, 16))
        lens = _pm_lengths(freqs, L)
        used = [(s, l) for s, l in enumerate(lens) if l]
        assert all(l <= L for _, l in used)
        assert all(freqs[s] > 0 for s, _ in used)
        assert all(lens[s] > 0 for s in range(300) if freqs[s] > 0)
        assert sum(2 ** -l for _, l in used) <= 1.0 + 1e-12   # Kraft


def test_rle_roundtrip_against_decoder_rules():
    """encoder RLE of code lengths decodes back via the spec rules."""
    from gigaspark.functions.webp import _rle_code_lengths
    rng = np.random.default_rng(11)
    for _ in range(30):
        lens = rng.integers(0, 9, 280)
        lens[rng.integers(0, 280, 200)] = 0
        seq = _rle_code_lengths(list(lens))
        out, i, prev = [0] * 280, 0, 8
        for s, ev, _eb in seq:
            if s < 16:
                out[i] = s
                i += 1
                if s:
                    prev = s
            elif s == 16:
                for _ in range(3 + ev):
                    out[i] = prev
                    i += 1
            elif s == 17:
                i += 3 + ev
            else:
                i += 11 + ev
        assert out == list(lens)
