"""GIF codec (functions/gif.py) — C8: the second real web format.

``Images.cpp`` decodes gif thumbnails in the reference [U][M]; here the
pure-numpy GIF87a/89a LZW codec replaces the round-1 stub.  GIF is
palette-indexed, so the encoder is lossless iff the input uses ≤256
distinct colors (web-graphic regime); :func:`palette_quantize` (3-3-2)
makes arbitrary images encodable deterministically.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gigaspark.functions.gif import (
    _DEINTERLACE_PASSES, _lzw_decode, _lzw_encode, decode_gif, encode_gif,
    palette_quantize,
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
@pytest.mark.parametrize("n", [1, 17, 5000])
def test_lzw_roundtrip(mcs, n):
    rng = np.random.default_rng(mcs * 1000 + n)
    idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx).all()


def test_lzw_dict_overflow_resets():
    # enough entropy to push the dictionary past 4096 entries → the
    # encoder must emit Clear and both sides must resynchronize
    rng = np.random.default_rng(99)
    idx = rng.integers(0, 256, 60000).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(idx, 8), 8, len(idx)) == idx).all()


@pytest.mark.parametrize("dims", [(12, 8), (7, 19), (64, 128)])
def test_roundtrip_lossless_under_256_colors(dims):
    w, h = dims
    rng = np.random.default_rng(w * h)
    # ≤8 distinct channel values → ≤512 combos; quantize guarantees ≤256
    pix = palette_quantize(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    back = decode_gif(encode_gif(pix))
    assert back.shape == pix.shape
    assert (back == pix).all()


def test_roundtrip_tiny_truecolor():
    # 96 pixels ≤ 256 colors → lossless without quantization
    rng = np.random.default_rng(5)
    pix = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    assert (decode_gif(encode_gif(pix)) == pix).all()


def test_two_color_and_full_palette():
    bw = np.zeros((16, 16, 3), np.uint8)
    bw[::2] = 255
    assert (decode_gif(encode_gif(bw)) == bw).all()
    grey = np.repeat(
        np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None], 3, axis=-1)
    assert (decode_gif(encode_gif(grey)) == grey).all()


def test_encoder_rejects_overwide_palette():
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ≫256 colors
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(pix)


def test_decoder_rejects_garbage():
    for bad in (b"", b"GIF87a", b"NOTGIF" + b"\x00" * 32,
                encode_gif(np.zeros((4, 4, 3), np.uint8))[:-10]):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_interlaced_gif89a_with_extensions():
    """Spec coverage the encoder doesn't emit: GIF89a signature,
    interlaced row order, GCE + comment extension blocks."""
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 8, (19, 7, 3), dtype=np.uint8) * 32
    h, w, _ = pix.shape
    flat = pix.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    mcs = max(2, bits)
    idx2d = inverse.astype(np.uint8).reshape(h, w)
    order = [y for start, step in _DEINTERLACE_PASSES
             for y in range(start, h, step)]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    out += b"\x21\xfe\x05hello\x00"             # comment extension
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    out.append(mcs)
    lzw = _lzw_encode(idx2d[order].reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    assert (decode_gif(bytes(out)) == pix).all()


def test_multimodal_gif_rows(spark):
    """gif rows flow decode_ok=true through the mapInPandas feature
    extractor; a corrupt webp blob stays a clean decode_ok=false miss
    (real lossless-webp decode is covered in test_webp.py)."""
    from gigaspark.functions.images import encode_image
    from gigaspark.operators.multimodal import extract_features

    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    rows = [("g0", bytearray(encode_image("gif", pix)), "gif"),
            ("g1", bytearray(encode_image("gif", palette_quantize(pix))), "gif"),
            ("wp", bytearray(b"RIFF....WEBP"), "webp"),
            ("gbad", bytearray(b"GIF87a\x00\x01"), "gif")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    feats = {r["image_id"]: r for r in extract_features(df).collect()}
    assert feats["g0"]["decode_ok"] and feats["g0"]["w"] == 12
    assert feats["g1"]["decode_ok"] and feats["g1"]["h"] == 8
    assert feats["wp"]["decode_ok"] is False
    assert feats["gbad"]["decode_ok"] is False


# ------------------------------------------------------------ animation ---


def test_anim_roundtrip_plain_and_delta():
    from gigaspark.functions.gif import decode_gif_frames, encode_gif_anim
    base = np.full((24, 32, 3), 40, dtype=np.uint8)
    frames = []
    for i in range(6):
        f = base.copy()
        f[4 + i * 2:10 + i * 2, 3 + i * 4:9 + i * 4] = [200, 16 + i * 8, 100]
        frames.append(f)
    for opt in (False, True):
        dec = decode_gif_frames(encode_gif_anim(frames, optimize_rects=opt))
        assert len(dec) == 6
        assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    # delta encoding is smaller
    assert len(encode_gif_anim(frames, optimize_rects=True)) \
        < len(encode_gif_anim(frames))


def test_anim_max_frames_and_first_frame():
    from gigaspark.functions.gif import (decode_gif, decode_gif_frames,
                                         encode_gif_anim)
    frames = [np.full((8, 8, 3), v * 30, dtype=np.uint8) for v in range(5)]
    blob = encode_gif_anim(frames)
    assert len(decode_gif_frames(blob, max_frames=2)) == 2
    assert np.array_equal(decode_gif(blob), frames[0])


def _gce(disposal, tidx=None):
    packed = (disposal << 2) | (1 if tidx is not None else 0)
    return b"\x21\xF9\x04" + struct.pack(
        "<BHB", packed, 5, tidx or 0) + b"\x00"


def test_disposal_background_and_previous():
    """Hand-crafted stream: disposal 2 restores the painted rect to the
    background color; disposal 3 restores the pre-frame canvas."""
    from gigaspark.functions.gif import _lzw_encode, decode_gif_frames
    # palette: 0=white bg, 1=red, 2=blue
    table = bytes([255, 255, 255, 255, 0, 0, 0, 0, 255, 0, 0, 0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0) + table

    def img(ix, iy, iw, ih, fill):
        body = bytearray(b"\x2C" + struct.pack("<HHHHB", ix, iy, iw, ih, 0))
        body.append(2)  # min code size
        lzw = _lzw_encode(np.full(iw * ih, fill, dtype=np.uint8), 2)
        body.append(len(lzw))
        body += lzw + b"\x00"
        return bytes(body)

    out += _gce(1) + img(0, 0, 4, 4, 1)        # frame 1: all red, keep
    out += _gce(2) + img(1, 1, 2, 2, 2)        # frame 2: blue patch, to-bg
    out += _gce(3) + img(0, 0, 2, 2, 2)        # frame 3: blue corner, to-prev
    out += _gce(1) + img(3, 3, 1, 1, 2)        # frame 4: one blue px, keep
    out += b"\x3B"
    f = decode_gif_frames(bytes(out))
    assert len(f) == 4
    assert (f[0] == [255, 0, 0]).all()                      # all red
    assert tuple(f[1][1, 1]) == (0, 0, 255)                 # blue patch shown
    # frame 3 canvas: patch region was restored to BACKGROUND (white)
    assert tuple(f[2][2, 2]) == (255, 255, 255)
    assert tuple(f[2][0, 0]) == (0, 0, 255)                 # frame-3 paint
    # frame 4: frame-3's paint was restored to PREVIOUS (red underneath)
    assert tuple(f[3][0, 0]) == (255, 0, 0)
    assert tuple(f[3][3, 3]) == (0, 0, 255)


def test_frame_sample_gif_anim(spark):
    from gigaspark.functions.gif import encode_gif_anim
    from gigaspark.functions.png import decode_png
    from gigaspark.operators.multimodal import frame_sample
    frames = [np.full((10, 12, 3), v * 20, dtype=np.uint8) for v in range(7)]
    rows = [("clip", bytearray(encode_gif_anim(frames)), "gif-anim"),
            ("bad", bytearray(b"GIF89a\x00"), "gif-anim")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    got = frame_sample(df, every_n=3).collect()
    good = sorted([r for r in got if r["decode_ok"]],
                  key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in good] == [0, 3, 6]
    assert all(r["fmt"] == "png" for r in good)
    assert np.array_equal(decode_png(bytes(good[1]["bytes"])), frames[3])
    assert any(not r["decode_ok"] for r in got)
