"""H.264/AVC intra codec + MP4 container tests (SURVEY §2.8 C8 — the
last video-codec stub).  Same contract as every other codec suite:
planted fixtures, bit-exact decoder-vs-encoder-reconstruction, PSNR
floor vs source (the BASELINE.json lossy invariant), corruption fuzz
inside the multimodal error channel, and the Spark mapInPandas path.
"""

import math
import struct
import zlib

import numpy as np
import pytest

from gigaspark.functions.h264 import (
    _BitReader, _BitWriter, _decode_residual, _ebsp_to_rbsp,
    _encode_residual, _rbsp_to_ebsp, decode_h264, decode_h264_yuv,
    encode_h264, split_nals)
from gigaspark.functions.mp4 import demux_mp4, mux_mp4

ALLOWED = (NotImplementedError, ValueError, KeyError, IndexError,
           struct.error, zlib.error)


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * math.log10(255.0 ** 2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 255 // max(1, w - 1), yy * 255 // max(1, h - 1),
                     (xx + yy) * 255 // max(1, w + h - 2)],
                    axis=-1).astype(np.uint8)


# ------------------------------------------------------------------ #
# bit layer                                                            #
# ------------------------------------------------------------------ #

def test_exp_golomb_roundtrip():
    bw = _BitWriter()
    vals = list(range(40)) + [255, 1023, 65535]
    svals = [0, 1, -1, 2, -2, 17, -31, 400, -400]
    for v in vals:
        bw.ue(v)
    for v in svals:
        bw.se(v)
    bw.trailing()
    br = _BitReader(bw.bytes())
    assert [br.ue() for _ in vals] == vals
    assert [br.se() for _ in svals] == svals


def test_emulation_prevention_roundtrip():
    rng = np.random.default_rng(11)
    for _ in range(200):
        raw = bytes(rng.integers(0, 4, size=rng.integers(1, 40),
                                 dtype=np.uint8))  # zero-heavy worst case
        assert _ebsp_to_rbsp(_rbsp_to_ebsp(raw)) == raw
        assert b"\x00\x00\x01" not in _rbsp_to_ebsp(raw)


def test_cavlc_residual_roundtrip_property():
    rng = np.random.default_rng(7)
    for trial in range(400):
        n = int(rng.integers(4, 17))
        coeffs = [0] * n
        for p in rng.choice(n, size=int(rng.integers(0, n + 1)),
                            replace=False):
            coeffs[p] = int(rng.integers(1, 600)) * \
                (1 if rng.random() < 0.5 else -1)
        for nc in (-1, 0, 1, 3, 5, 9, 20):
            if nc == -1 and n != 4:
                continue
            bw = _BitWriter()
            _encode_residual(bw, coeffs, nc, n)
            bw.trailing()
            out, _tc = _decode_residual(_BitReader(bw.bytes()), nc, n)
            assert out == coeffs, (trial, nc)


def test_cavlc_large_levels_escape_path():
    # levels big enough to hit the prefix>=15 escape at every suffix len
    coeffs = [30000, -20000, 9000, -4500, 2000, -900, 400, -150, 60,
              -25, 10, -4, 1, -1, 1, 0]
    bw = _BitWriter()
    _encode_residual(bw, coeffs, 0, 16)
    bw.trailing()
    out, tc = _decode_residual(_BitReader(bw.bytes()), 0, 16)
    assert out == coeffs and tc == 15


# ------------------------------------------------------------------ #
# frame round trips                                                    #
# ------------------------------------------------------------------ #

def test_flat_frame_i16x16_bit_exact():
    frame = np.full((32, 48, 3), 137, np.uint8)  # flat -> I_16x16 path
    data, recons = encode_h264([frame], qp=8, return_recon=True)
    dec = decode_h264(data)
    assert np.array_equal(dec[0], recons[0])
    assert _psnr(dec[0], frame) >= 40.0


def test_detailed_frame_i4x4_bit_exact():
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # I_4x4
    data, recons = encode_h264([frame], qp=10, return_recon=True)
    dec = decode_h264(data)
    assert np.array_equal(dec[0], recons[0])
    # luma fidelity is the codec's job; RGB PSNR on noise is bounded
    # by 4:2:0 subsampling, so check the decoded LUMA plane instead
    from gigaspark.functions.h264 import _rgb_to_yuv420
    y, _, _ = _rgb_to_yuv420(frame)
    ydec, _, _ = decode_h264_yuv(data)[0]
    assert _psnr(ydec, y) >= 40.0


def test_gradient_psnr_meets_lossy_invariant():
    frame = _gradient(48, 64)
    data = encode_h264([frame], qp=6)
    dec = decode_h264(data)
    assert _psnr(dec[0], frame) >= 40.0  # BASELINE.json lossy bar


def test_cropped_dims_and_multiframe():
    frames = [_gradient(20, 28), np.full((20, 28, 3), 90, np.uint8)]
    data, recons = encode_h264(frames, qp=8, return_recon=True)
    dec = decode_h264(data)
    assert len(dec) == 2
    for d, r in zip(dec, recons):
        assert d.shape == (20, 28, 3)
        assert np.array_equal(d, r)


def test_qp_sweep_monotone_fidelity():
    frame = _gradient(32, 32)
    last = 100.0
    sizes = []
    for qp in (4, 16, 28, 40):
        data = encode_h264([frame], qp=qp)
        sizes.append(len(data))
        p = _psnr(decode_h264(data)[0], frame)
        assert p <= last + 1.0  # fidelity decays (tolerance for ties)
        last = p
    assert sizes[0] > sizes[-1]  # rate decays too


def test_odd_dims_rejected():
    with pytest.raises(ValueError):
        encode_h264([np.zeros((15, 16, 3), np.uint8)])


def test_split_nals_structure():
    data = encode_h264([_gradient(16, 16)], qp=10)
    types = [t for t, _ in split_nals(data)]
    assert types[:2] == [7, 8] and types[2] == 5  # SPS, PPS, IDR


# ------------------------------------------------------------------ #
# P slices (inter prediction)                                          #
# ------------------------------------------------------------------ #

def _pan_frames(n, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.stack([(xx * 4 + f * 8) % 256, (yy * 3 + f * 4) % 256,
                      ((xx + yy) * 2) % 256],
                     axis=-1).astype(np.uint8) for f in range(n)]


def test_p_slices_bit_exact_and_smaller():
    frames = _pan_frames(5)
    data, recons = encode_h264(frames, qp=8, inter=True,
                               return_recon=True)
    dec = decode_h264(data)
    assert len(dec) == 5
    for d, r, src in zip(dec, recons, frames):
        assert np.array_equal(d, r)          # decoder == encoder recon
        assert _psnr(d, src) >= 40.0
    types = [t for t, _ in split_nals(data)]
    assert types[2] == 5 and set(types[3:]) == {1}  # IDR then P NALs
    # motion compensation must beat all-intra on a pan
    assert len(data) < len(encode_h264(frames, qp=8))


def test_p_skip_static_scene():
    still = [_pan_frames(1)[0]] * 4
    data = encode_h264(still, qp=8, inter=True)
    dec = decode_h264(data)
    assert len(dec) == 4
    # a static scene is mostly P_Skip: the 3 P frames together must be
    # far smaller than one more IDR would be
    intra = encode_h264(still[:2], qp=8)
    idr_size = len(intra) - len(encode_h264(still[:1], qp=8))
    p_total = len(data) - len(encode_h264(still[:1], qp=8))
    assert p_total < idr_size  # 3 P frames < 1 IDR frame
    # successive P frames converge toward the source (residual coding
    # against the reference refines what the IDR quantized away)
    assert _psnr(dec[3], still[3]) >= _psnr(dec[0], still[0]) - 0.1


def test_p_intra_fallback_on_cut():
    h, w = 32, 48
    a = np.full((h, w, 3), 40, np.uint8)
    rng = np.random.default_rng(9)
    b = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # hard cut
    data, recons = encode_h264([a, a, b], qp=10, inter=True,
                               return_recon=True)
    dec = decode_h264(data)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_p_cropped_dims():
    frames = [f[:20, :28] for f in _pan_frames(3)]
    data, recons = encode_h264([np.ascontiguousarray(f) for f in frames],
                               qp=8, inter=True, return_recon=True)
    dec = decode_h264(data)
    assert all(d.shape == (20, 28, 3) for d in dec)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_p_stream_without_reference_rejected():
    frames = _pan_frames(2, 32, 32)
    data = encode_h264(frames, qp=10, inter=True)
    nals = split_nals(data)
    # rebuild the stream without the IDR: SPS + PPS + the P NAL only
    from gigaspark.functions.h264 import _nal, _rbsp_to_ebsp  # noqa: F401
    out = bytearray()
    for t, rbsp in nals:
        if t == 5:
            continue
        hdr = bytes([(3 << 5) | t])
        out += b"\x00\x00\x00\x01" + hdr + _rbsp_to_ebsp(rbsp)
    with pytest.raises(ValueError):
        decode_h264(bytes(out))


def test_mp4_inter_roundtrip_with_stss():
    frames = _pan_frames(4, 32, 48)
    annexb, recons = encode_h264(frames, qp=9, inter=True,
                                 return_recon=True)
    mp4 = mux_mp4(annexb, 48, 32)
    assert b"stss" in mp4                      # sync-sample table
    dec = decode_h264(demux_mp4(mp4))
    assert all(np.array_equal(d, r) for d, r in zip(dec, recons))


# ------------------------------------------------------------------ #
# mp4 container                                                        #
# ------------------------------------------------------------------ #

def test_mp4_mux_demux_roundtrip():
    frames = [_gradient(32, 48), np.full((32, 48, 3), 200, np.uint8),
              _gradient(32, 48)[::-1].copy()]
    annexb, recons = encode_h264(frames, qp=8, return_recon=True)
    mp4 = mux_mp4(annexb, 48, 32, fps=24)
    assert mp4[4:8] == b"ftyp"
    dec = decode_h264(demux_mp4(mp4))
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_mp4_rejects_non_video_and_garbage():
    with pytest.raises(ALLOWED):
        demux_mp4(b"not an mp4 at all")
    with pytest.raises(ALLOWED):
        demux_mp4(b"\x00\x00\x00\x08ftyp")


def test_h264_and_mp4_corruption_fuzz():
    annexb = encode_h264([_gradient(32, 32)], qp=12)
    mp4 = mux_mp4(annexb, 32, 32)
    rng = np.random.default_rng(13)
    for blob, decode in ((annexb, decode_h264),
                         (mp4, lambda b: decode_h264(demux_mp4(b)))):
        for cut in (0, 1, 5, 20, len(blob) // 2, len(blob) - 1):
            try:
                decode(blob[:cut])
            except ALLOWED:
                pass
        for _ in range(40):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            try:
                decode(bytes(b))
            except ALLOWED:
                pass


# ------------------------------------------------------------------ #
# Spark integration (same mapInPandas path as avi-mjpg/gif-anim)       #
# ------------------------------------------------------------------ #

def test_frame_sample_and_scene_cuts_mp4(spark):
    from gigaspark.operators.multimodal import frame_sample, scene_cuts

    flat = np.full((32, 32, 3), 60, np.uint8)
    bright = np.full((32, 32, 3), 220, np.uint8)
    annexb = encode_h264([flat, flat, bright, bright], qp=8)
    mp4 = mux_mp4(annexb, 32, 32)
    rows = [("v1", bytearray(mp4), "mp4-avc"),
            ("v2", bytearray(annexb), "h264"),
            ("bad", bytearray(b"\x00\x00\x00\x08ftypjunk"), "mp4-avc")]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")

    frames = frame_sample(videos, every_n=1).collect()
    ok = [r for r in frames if r.decode_ok]
    assert {r.video_id for r in ok} == {"v1", "v2"}
    assert sum(1 for r in ok if r.video_id == "v1") == 4
    assert all(r.fmt == "png" for r in ok)
    assert [r.decode_ok for r in frames if r.video_id == "bad"] == [False]

    cuts = scene_cuts(videos, threshold=24.0).collect()
    v1 = sorted([r for r in cuts if r.video_id == "v1"],
                key=lambda r: r.frame_idx)
    assert [r.is_cut for r in v1] == [False, True, False]  # planted cut
    assert [r.decode_ok for r in cuts if r.video_id == "bad"] == [False]
