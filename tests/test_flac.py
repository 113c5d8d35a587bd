"""FLAC codec tests (gigaspark/functions/flac.py).

Spec-exact lossless codec: every roundtrip asserts BIT-EXACT PCM
recovery (the STREAMINFO MD5 gate inside decode_flac is itself a
whole-file integrity check).  No libFLAC in this sandbox; structures
per the public xiph.org format spec.
"""

import numpy as np
import pytest

from gigaspark.functions.flac import (
    _BR, _BW, _crc8, _crc16, decode_flac, encode_flac,
)


def _pcm(s):
    if s.ndim == 1:
        s = s[:, None]
    return np.clip(np.round(s * 32767.0), -32768, 32767)


def _roundtrip_exact(s, **kw):
    out, rate = decode_flac(encode_flac(s, 8000, **kw))
    return np.array_equal(_pcm(s), np.round(out * 32767.0))


def _sine(n=9000, f=440.0, amp=0.8, rate=8000):
    return np.sin(2 * np.pi * f * np.arange(n) / rate) * amp


# ------------------------------------------------------------- bits/crc ---


def test_bitio_roundtrip():
    rng = np.random.default_rng(0)
    vals = [(int(v), int(n)) for v, n in
            zip(rng.integers(0, 2**16, 200), rng.integers(1, 17, 200))]
    bw = _BW()
    for v, n in vals:
        bw.w(v & ((1 << n) - 1), n)
    bw.align()
    br = _BR(bw.bytes())
    assert all(br.r(n) == (v & ((1 << n) - 1)) for v, n in vals)


def test_unary_roundtrip():
    bw = _BW()
    qs = [0, 1, 7, 31, 32, 100, 3]
    for q in qs:
        bw.unary(q)
    bw.align()
    br = _BR(bw.bytes())
    assert [br.unary() for _ in qs] == qs


def test_crc_vectors():
    # poly 0x07 and 0x8005 sanity: CRC of empty is 0, stable known values
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"123456789") == 0xF4       # CRC-8/ATM check value
    assert _crc16(b"123456789") == 0xFEE8    # CRC-16/BUYPASS check value


# ------------------------------------------------------------ roundtrips --


def test_mono_sine_exact_and_compresses():
    s = _sine()
    blob = encode_flac(s, 8000)
    assert len(blob) < s.size * 2        # beats raw PCM
    assert _roundtrip_exact(s)


def test_constant_block():
    assert _roundtrip_exact(np.full(5000, 0.25))


def test_stereo_independent_noise():
    rng = np.random.default_rng(1)
    assert _roundtrip_exact(rng.normal(0, 0.2, (5000, 2)).clip(-1, 1))


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(stereo):
    """Side channel carries bps+1 bits; mid/side reconstruction uses
    the spec's (mid<<1)|(side&1) trick — all three assignments exact."""
    rng = np.random.default_rng(2)
    t = np.arange(9000) / 8000
    s = np.stack([np.sin(2 * np.pi * 300 * t),
                  np.sin(2 * np.pi * 300 * t) * 0.95
                  + rng.normal(0, 0.01, len(t))], axis=1).clip(-1, 1)
    assert _roundtrip_exact(s, stereo=stereo)


def test_verbatim_and_lpc_subframes():
    rng = np.random.default_rng(3)
    assert _roundtrip_exact(rng.normal(0, 0.5, 3000).clip(-1, 1),
                            mode="verbatim")
    assert _roundtrip_exact(_sine(f=100.0, amp=0.7), mode="lpc",
                            lpc=([3, -3, 1], 0, 12))
    # LPC with a real shift
    assert _roundtrip_exact(_sine(f=150.0), mode="lpc",
                            lpc=([6, -6, 2], 1, 12))


def test_rice_partitions():
    assert _roundtrip_exact(_sine(8192, 200.0, 0.6), part_order=3)


def test_ragged_tail_blocks():
    assert _roundtrip_exact(_sine(5000, 50.0), blocksize=4096)
    assert _roundtrip_exact(_sine(1, 50.0))     # single sample


def test_extremes_exact():
    s = np.array([1.0, -1.0] * 600)
    assert _roundtrip_exact(s)


# ---------------------------------------------------------------- errors --


def test_error_paths():
    with pytest.raises(ValueError):
        decode_flac(b"not flac")
    blob = bytearray(encode_flac(_sine(3000)))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:40]))            # truncated
    corrupt = bytearray(blob)
    corrupt[-3] ^= 0x40                          # flip a residual bit
    with pytest.raises(ValueError):              # CRC-16 or MD5 catches it
        decode_flac(bytes(corrupt))
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 3)))           # 3 channels


def test_md5_gate_catches_metadata_tamper():
    blob = bytearray(encode_flac(_sine(3000)))
    # tamper the STREAMINFO md5 (last 16 bytes of the 34+4-byte block)
    blob[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


# ------------------------------------------------------------ pipeline ----


def test_audio_features_flac(spark):
    from gigaspark.functions.flac import encode_flac as enc
    from gigaspark.operators.multimodal import audio_features

    t = np.arange(2000) / 8000
    s = np.stack([np.sin(2 * np.pi * 440 * t),
                  np.sin(2 * np.pi * 220 * t)], axis=1) * 0.5
    rows = [("flacclip", bytearray(enc(s, 8000, stereo="mid_side")), "flac"),
            ("badflac", bytearray(b"fLaCgarbage"), "flac")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert got["flacclip"]["decode_ok"] and got["flacclip"]["n_channels"] == 2
    assert abs(got["flacclip"]["duration_s"] - 0.25) < 1e-9
    assert not got["badflac"]["decode_ok"]


def test_escape_residual_roundtrip():
    """Rice escape (param 0b1111 → raw 5-bit-width residuals) — forced
    directly with pathological residual magnitudes."""
    from gigaspark.functions.flac import _BR, _BW, _read_residual, \
        _write_residual
    big = np.array([500000, -500000, 3, -2] * 64, dtype=np.int64)
    bw = _BW()
    _write_residual(bw, big, 0, len(big), 0)
    bw.align()
    out = _read_residual(_BR(bw.bytes()), 0, len(big))
    assert np.array_equal(out, big)
