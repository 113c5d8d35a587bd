"""Audio (WAV), video (AVI/MJPEG) and perceptual-hash operators.

These make the previously-stubbed halves of the multimodal axis REAL:
pure-python RIFF/WAVE PCM decode, RIFF/AVI MJPEG frame extraction via
the numpy baseline-JPEG codec, and dHash/aHash/pHash near-dup detection
with lossless banded hamming-LSH."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gigaspark.functions.avi import decode_avi_frames, encode_avi_mjpeg
from gigaspark.functions.phash import ahash64, dhash64, gray_area, phash64
from gigaspark.functions.wav import decode_wav, encode_wav


# ------------------------------------------------------------------ wav ---

def test_wav_roundtrip_16bit_stereo():
    t = np.arange(8000) / 16000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 880 * t)], axis=1)
    out, rate = decode_wav(encode_wav(sig, 16000, 16))
    assert rate == 16000 and out.shape == (8000, 2)
    assert np.abs(out - sig).max() < 1e-4


def test_wav_8bit_and_junk_chunks():
    sig = np.linspace(-1, 1, 100)
    blob = bytearray(encode_wav(sig, 8000, 8))
    # splice an unknown chunk between fmt and data (real WAVs have LIST)
    import struct
    insert = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt_end = 12 + 8 + 16
    blob2 = bytes(blob[:fmt_end]) + insert + bytes(blob[fmt_end:])
    blob2 = blob2[:4] + struct.pack("<I", len(blob2) - 8) + blob2[8:]
    out, rate = decode_wav(blob2)
    assert rate == 8000 and len(out) == 100
    assert np.abs(out[:, 0] - sig).max() < 1 / 64


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


# ------------------------------------------------------------------ avi ---

def test_avi_mjpeg_roundtrip():
    frames = []
    for f in range(7):
        y, x = np.mgrid[0:16, 0:24]
        frames.append(((x * 5 + y * 3 + f * 17) % 256).astype(np.uint8)
                      [..., None].repeat(3, axis=2))
    jpgs = decode_avi_frames(encode_avi_mjpeg(frames, fps=10))
    assert len(jpgs) == 7
    from gigaspark.functions.jpeg import decode_jpeg
    for f, j in zip(frames, jpgs):
        pix = decode_jpeg(j)
        assert pix.shape == (16, 24, 3)
        assert np.abs(pix.astype(float) - f.astype(float)).mean() < 12


def test_avi_rejects_garbage():
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        decode_avi_frames(b"\x00\x00\x00 ftypmp42")


# ---------------------------------------------------------------- phash ---

def _grad_img(seed: int, h=40, w=56) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * (3 + seed % 5) + y * (2 + seed % 7) + seed) % 256)
    return np.stack([base, base[::-1], np.roll(base, h // 2, axis=0)],
                    axis=2).astype(np.uint8)


def test_gray_area_is_windowed_mean():
    pix = np.arange(64, dtype=np.uint8).reshape(8, 8)[..., None].repeat(3, 2)
    g = gray_area(pix, 2, 2)
    assert g.shape == (2, 2)
    assert abs(g[0, 0] - pix[:4, :4, 0].mean()) < 1e-9


def _natural_img(seed: int, n=64) -> np.ndarray:
    """Random field with 1/f spectrum via inverse DCT — the dense-
    spectrum statistics of natural photos (a sparse-spectrum synthetic
    gradient leaves most DCT coefficients ≈0, whose signs — hence pHash
    bits — are decided by noise; real pHash assumes natural images)."""
    from gigaspark.functions.phash import _dct_mat
    rng = np.random.default_rng(seed)
    u, v = np.mgrid[0:n, 0:n]
    coef = rng.normal(0, 1, (n, n)) * 2000.0 / (1.0 + u + v) ** 1.5
    coef[0, 0] = 40000  # DC → mid gray
    d = _dct_mat(n)
    img = d.T @ coef @ d / (n * n / 4)
    img = np.clip(img - img.min(), 0, None)
    img = (img / img.max() * 255).astype(np.uint8)
    return img[..., None].repeat(3, axis=2)


def test_hashes_stable_under_noise_and_resize():
    rng = np.random.default_rng(3)
    pix = _natural_img(1)
    noisy = np.clip(pix.astype(np.int16) + rng.integers(-8, 9, pix.shape),
                    0, 255).astype(np.uint8)
    # nearest-neighbour upscale 2x
    big = pix.repeat(2, axis=0).repeat(2, axis=1)
    other = _natural_img(9)
    for h in (dhash64, ahash64, phash64):
        d_noise = bin(h(pix) ^ h(noisy)).count("1")
        d_scale = bin(h(pix) ^ h(big)).count("1")
        d_other = bin(h(pix) ^ h(other)).count("1")
        assert d_noise <= 8, (h.__name__, d_noise)
        assert d_scale <= 8, (h.__name__, d_scale)
        assert d_other > 12, (h.__name__, d_other)


# ------------------------------------------------------- spark operators ---

def test_audio_features_operator(spark):
    from gigaspark.operators.multimodal import audio_features

    t = np.arange(4000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 100 * t)
    rows = [("a", bytearray(encode_wav(sig, 8000, 16)), "wav"),
            ("bad", bytearray(b"RIFFxxxxWAVE"), "wav"),
            ("mp3", bytearray(b"ID3\x03"), "mp3")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    a = got["a"]
    assert a["decode_ok"] and a["sample_rate"] == 8000
    assert abs(a["duration_s"] - 0.5) < 1e-6
    assert abs(a["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(a["zcr"] - 2 * 100 / 8000.0) < 0.005  # 2 crossings/cycle
    assert got["bad"]["decode_ok"] is False
    assert got["mp3"]["decode_ok"] is False


def test_frame_sample_operator(spark):
    from gigaspark.operators.multimodal import extract_features, frame_sample

    frames = [_grad_img(i, 16, 24) for i in range(12)]
    rows = [("v0", bytearray(encode_avi_mjpeg(frames, fps=10)), "avi-mjpg"),
            ("vbad", bytearray(b"nope"), "avi-mjpg"),
            ("vmp4", bytearray(b"\x00\x00\x00 ftypmp42"), "mp4")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = frame_sample(df, every_n=5).collect()
    ok = sorted((r["video_id"], r["frame_idx"]) for r in out if r["decode_ok"])
    assert ok == [("v0", 0), ("v0", 5), ("v0", 10)]
    bad = {r["video_id"] for r in out if not r["decode_ok"]}
    assert bad == {"vbad", "vmp4"}
    # sampled frames are consumable by the image ops unchanged
    imgs = (frame_sample(df, every_n=5).where(F.col("decode_ok"))
            .select(F.col("video_id").alias("image_id"), "bytes", "fmt"))
    feats = extract_features(imgs).collect()
    assert len(feats) == 3 and all(r["decode_ok"] for r in feats)


def test_image_phash_and_neardup_pairs(spark):
    from gigaspark.functions.images import encode_image
    from gigaspark.operators.dedup import hamming_neardup_pairs
    from gigaspark.operators.multimodal import image_phash

    rng = np.random.default_rng(11)
    rows = []
    for i in range(20):
        pix = _grad_img(i)
        rows.append((f"base{i}", bytearray(encode_image("png", pix)), "png"))
        if i % 4 == 0:
            noisy = np.clip(pix.astype(np.int16)
                            + rng.integers(-6, 7, pix.shape), 0, 255
                            ).astype(np.uint8)
            rows.append((f"copy{i}", bytearray(encode_image("png", noisy)), "png"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    sigs = image_phash(df).where("decode_ok")
    pairs = hamming_neardup_pairs(sigs, "image_id", "dhash64",
                                  bits=64, n_bands=8, max_dist=6)
    found = {tuple(sorted((r["a_id"], r["b_id"]))) for r in pairs.collect()}
    for i in range(0, 20, 4):
        assert (f"base{i}", f"copy{i}") in found, f"planted pair {i} missed"


def test_hamming_banding_is_lossless(spark):
    """Bucket-join pairs == all-pairs filter for max_dist < n_bands."""
    from gigaspark.operators.dedup import hamming_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(-(1 << 62), 1 << 62, 60, dtype=np.int64)
    vals = list(base)
    for i in range(0, 60, 6):  # plant close neighbours (flip ≤3 bits)
        v = int(base[i])
        for b in rng.integers(0, 64, int(rng.integers(1, 4))):
            v ^= 1 << int(b)
        vals.append(np.int64(v))
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vals)], "id int, sig long")
    got = {(r["a_id"], r["b_id"], r["dist"]) for r in
           hamming_neardup_pairs(df, "id", "sig", 64, 8, 3).collect()}
    import itertools
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
        d = bin(int(a) ^ int(b) & ((1 << 64) - 1)).count("1")
        d = bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            want.add((i, j, d))
    assert got == want and len(want) >= 10


def test_audio_spectral_features(spark):
    """Planted pure tones must land on their FFT bin: dominant frequency
    within one bin of the planted pitch; a two-tone chord's centroid
    sits between the partials, nearer the stronger one."""
    import numpy as np

    from gigaspark.functions.wav import encode_wav
    from gigaspark.operators.multimodal import audio_features

    rate, dur = 8000, 0.5
    t = np.arange(int(rate * dur)) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    chord = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1760 * t)
    rows = [("tone440", bytearray(encode_wav(tone, rate)), "wav"),
            ("chord", bytearray(encode_wav(chord, rate)), "wav")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}

    binw = 1.0 / dur  # FFT bin width = 2 Hz at 0.5 s
    assert abs(got["tone440"]["dom_freq_hz"] - 440) <= binw
    assert abs(got["tone440"]["centroid_hz"] - 440) <= 25  # quantization noise floor
    c = got["chord"]
    assert abs(c["dom_freq_hz"] - 440) <= binw        # stronger partial wins
    assert 440 < c["centroid_hz"] < 1760              # centroid between partials
    assert c["centroid_hz"] < 1100                    # ... nearer the 2x-stronger one


def test_scene_cut_detection(spark):
    """Hard palette switches at known indices are the only cuts; a
    gradual luminance ramp never triggers."""
    import numpy as np

    from gigaspark.operators.multimodal import scene_cuts

    def flat(v):
        return np.full((16, 24, 3), v, dtype=np.uint8)

    # shots: 5 frames @40, 5 frames @200 (cut at idx 5), 5 @90 (cut at 10)
    frames = [flat(40)] * 5 + [flat(200)] * 5 + [flat(90)] * 5
    ramp = [flat(40 + 4 * i) for i in range(15)]  # +4 levels/frame, no cut
    rows = [("vcut", bytearray(encode_avi_mjpeg(frames, fps=10)), "avi-mjpg"),
            ("vramp", bytearray(encode_avi_mjpeg(ramp, fps=10)), "avi-mjpg"),
            ("vbad", bytearray(b"nope"), "avi-mjpg")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = scene_cuts(df, threshold=24.0).collect()
    cuts = sorted((r["video_id"], r["frame_idx"])
                  for r in out if r["decode_ok"] and r["is_cut"])
    assert cuts == [("vcut", 5), ("vcut", 10)]
    assert {r["video_id"] for r in out if not r["decode_ok"]} == {"vbad"}
    # every non-cut transition is quiet (JPEG noise floor << threshold)
    quiet = [r["mean_diff"] for r in out
             if r["decode_ok"] and not r["is_cut"]]
    assert quiet and max(quiet) < 12


# ------------------------------------------------------------- mpeg-1 ---
def test_mpeg1_layer1_roundtrip_mono_and_stereo():
    import numpy as np

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer1

    t = np.arange(3840) / 32000.0
    sig = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    out, rate = decode_mpeg1(encode_layer1(sig, 32000, alloc=7))
    assert rate == 32000 and out.shape == (3840, 1)
    assert np.abs(out[:, 0] - sig).max() < 0.005   # 8-bit codes ≈ 54 dB
    st = np.stack([sig, 0.3 * np.sin(2 * np.pi * 440.0 * t)], axis=1)
    o2, r2 = decode_mpeg1(encode_layer1(st, 32000, alloc=4))
    assert r2 == 32000 and o2.shape == st.shape
    assert np.abs(o2 - st).max() < 0.05            # 5-bit codes


def test_mpeg1_rejects_garbage_and_pins_layers_out():
    import numpy as np
    import pytest

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer1

    from gigaspark.functions.mpeg_audio import encode_layer3

    with pytest.raises(ValueError):
        decode_mpeg1(b"\x00\x01\x02\x03\x04\x05")
    with pytest.raises(ValueError):
        decode_mpeg1(b"ID3\x04junkjunkjunk")
    # flip the layer bits to reserved (0b00): typed ValueError
    blob = bytearray(encode_layer1(np.zeros(384), 32000, alloc=2))
    blob[1] = blob[1] & ~0b110
    with pytest.raises(ValueError):
        decode_mpeg1(bytes(blob))
    # L3 main_data_begin pointing past the (empty) reservoir: the
    # reservoir is implemented now, so this is a typed DATA error
    l3 = bytearray(encode_layer3(np.zeros(1152), 32000))
    l3[4] = 0xFF                       # first 9 side-info bits
    with pytest.raises(ValueError):
        decode_mpeg1(bytes(l3))
    # L3 short blocks (window_switching_flag): pinned out, typed error.
    # wsf is bit 34 of the mono side info (9+5+4+12+9+8+4 = 51 bits in
    # → byte 4+6, bit offset 51%8=3)
    l3b = bytearray(encode_layer3(np.zeros(1152), 32000))
    l3b[4 + 51 // 8] |= 1 << (7 - 51 % 8)
    with pytest.raises(NotImplementedError):
        decode_mpeg1(bytes(l3b))


def test_audio_features_decodes_planted_mp3_tone(spark):
    import numpy as np

    from gigaspark.functions.mpeg_audio import encode_layer1
    from gigaspark.operators.multimodal import audio_features

    t = np.arange(32000) / 32000.0                 # 1 s
    tone = 0.5 * np.sin(2 * np.pi * 1250.0 * t)
    rows = [("m1", bytearray(encode_layer1(tone, 32000, alloc=7)), "mp3"),
            ("bad", bytearray(b"\xff\xf0nope"), "mp3"),
            ("oga", bytearray(b"OggS\x00junk"), "ogg")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert got["m1"]["decode_ok"] is True
    assert got["m1"]["sample_rate"] == 32000
    assert abs(got["m1"]["dom_freq_hz"] - 1250.0) < 10.0
    assert got["bad"]["decode_ok"] is False
    assert got["oga"]["decode_ok"] is False


def test_mpeg1_layer2_roundtrip_and_mechanisms():
    """Layer II: 1152-sample frames, scfsi sharing, grouped 3/5/9-level
    codes — round-trip within the pinned allocation's resolution, and
    the stream decodes through the SAME decode_mpeg1 entry (header
    dispatch), including a mixed Layer I + Layer II byte stream
    stopping cleanly at the layer change."""
    import numpy as np

    from gigaspark.functions.mpeg_audio import (
        decode_mpeg1, encode_layer1, encode_layer2)

    t = np.arange(1152 * 3) / 32000.0
    sig = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    out, rate = decode_mpeg1(encode_layer2(sig, 32000))
    assert rate == 32000 and out.shape == (1152 * 3, 1)
    assert np.abs(out[:, 0] - sig).max() < 0.02
    st = np.stack([sig, 0.3 * np.sin(2 * np.pi * 440.0 * t)], axis=1)
    o2, _ = decode_mpeg1(encode_layer2(st, 32000))
    assert np.abs(o2 - st).max() < 0.05
    # quiet signal exercises high scalefactor indices + scfsi=2 sharing
    o3, _ = decode_mpeg1(encode_layer2(sig * 1e-3, 32000))
    assert np.abs(o3[:, 0] - sig * 1e-3).max() < 1e-4


def test_mpeg1_layer3_roundtrip_and_mechanisms():
    """Layer III: spec side-info layout, pair-Huffman + linbits ESC +
    count1 quadruples, x^(4/3) requantization, alias butterflies,
    18-point IMDCT with TDAC overlap-add — round-trip through the SAME
    decode_mpeg1 entry.  The decoder output lags the input by one
    granule (576 samples, the MDCT overlap delay), so comparisons are
    shifted and edge granules excluded."""
    import numpy as np

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer3

    D = 576
    t = np.arange(1152 * 4) / 32000.0
    sig = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    out, rate = decode_mpeg1(encode_layer3(sig, 32000))
    assert rate == 32000 and out.shape == (1152 * 4, 1)
    assert np.abs(out[D + 576:-576, 0]
                  - sig[576:len(out) - D - 576]).max() < 2e-3
    st = np.stack([sig, 0.3 * np.sin(2 * np.pi * 440.0 * t)], axis=1)
    o2, _ = decode_mpeg1(encode_layer3(st, 32000))
    assert np.abs(o2[D + 576:-576]
                  - st[576:len(o2) - D - 576]).max() < 0.02
    # quiet signal: global_gain bottoms out, error stays proportional
    o3, _ = decode_mpeg1(encode_layer3(sig * 1e-3, 32000))
    assert np.abs(o3[D + 576:-576, 0]
                  - sig[576:len(o3) - D - 576] * 1e-3).max() < 1e-4
    # noise: the 12-bit part2_3_length cap forces the rate loop to
    # coarsen — decode must stay sane (bounded error, exact framing)
    rng = np.random.default_rng(7)
    nz = np.clip(rng.standard_normal(1152 * 2) * 0.2, -0.95, 0.95)
    o4, _ = decode_mpeg1(encode_layer3(nz, 32000))
    assert o4.shape == (1152 * 2, 1)
    assert np.abs(o4[D + 576:-576, 0]
                  - nz[576:len(o4) - D - 576]).max() < 0.2


def test_mpeg1_layer3_ms_stereo_roundtrip():
    """MS joint stereo (mode 01, mode_extension bit 1): header bits
    correct, (L±R)/√2 spectral matrixing inverts through decode, and
    an intensity-flagged stream takes the typed pinned-out path."""
    import numpy as np
    import pytest

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer3

    D = 576
    t = np.arange(1152 * 4) / 32000.0
    st = np.stack([0.6 * np.sin(2 * np.pi * 1000.0 * t),
                   0.3 * np.sin(2 * np.pi * 440.0 * t)], axis=1)
    enc = encode_layer3(st, 32000, ms_stereo=True)
    assert (enc[3] >> 6) & 3 == 1 and (enc[3] >> 4) & 3 == 2
    out, rate = decode_mpeg1(enc)
    assert rate == 32000 and out.shape == (1152 * 4, 2)
    assert np.abs(out[D + 576:-576]
                  - st[576:len(out) - D - 576]).max() < 0.02
    # strongly correlated channels: MS must not break either side
    corr = np.stack([st[:, 0], st[:, 0] * 0.98], axis=1)
    oc, _ = decode_mpeg1(encode_layer3(corr, 32000, ms_stereo=True))
    assert np.abs(oc[D + 576:-576]
                  - corr[576:len(oc) - D - 576]).max() < 0.02
    with pytest.raises(ValueError):
        encode_layer3(st[:, 0], 32000, ms_stereo=True)  # needs 2 ch


def test_mpeg1_layer3_intensity_stereo():
    """Intensity stereo (mode 01, mode_extension bit 0): above the
    bound the left channel carries L+R and the right channel's
    scalefactors carry is_pos; decode reconstructs the stereo angle
    by the tan(is_pos·π/12) ratio law.  Checks: header bits, the
    panned high tone comes back at ~the quantized pan, the sub-bound
    band keeps its own stereo, MS composes, and the pinned-out
    short-block combination is typed."""
    import numpy as np
    import pytest

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer3

    fs = 32000
    t = np.arange(fs) / fs
    bass = 0.4 * np.sin(2 * np.pi * 440.0 * t)      # sub-bound, equal
    high = np.sin(2 * np.pi * 6000.0 * t)            # sfb 17 (intensity)
    pcm = np.stack([bass + 0.40 * high, bass + 0.10 * high], axis=1)

    for ms in (False, True):
        enc = encode_layer3(pcm, fs, ms_stereo=ms, intensity=True)
        assert (enc[3] >> 6) & 3 == 1                # joint stereo
        assert (enc[3] >> 4) & 1 == 1                # intensity bit
        assert ((enc[3] >> 5) & 1) == (1 if ms else 0)
        out, rate = decode_mpeg1(enc)
        assert rate == fs and out.shape[1] == 2
        seg = out[4000:28000]
        f = np.fft.rfftfreq(len(seg), 1.0 / fs)
        kh = int(np.argmin(np.abs(f - 6000.0)))
        kb = int(np.argmin(np.abs(f - 440.0)))
        mh = [np.abs(np.fft.rfft(seg[:, c]))[kh] for c in (0, 1)]
        mb = [np.abs(np.fft.rfft(seg[:, c]))[kb] for c in (0, 1)]
        # source pan 4.0, quantized is_pos 5 → 3.73; MDCT leakage
        # across the band edge erodes it a little
        assert 2.6 < mh[0] / mh[1] < 4.6, (ms, mh)
        assert 0.9 < mb[0] / mb[1] < 1.1, (ms, mb)   # bass untouched

    # intensity-MS stream is smaller than plain stereo (the whole
    # point): side channel near-zero below, zeros above the bound
    assert len(encode_layer3(pcm, fs, ms_stereo=True, intensity=True)) \
        < len(encode_layer3(pcm, fs))
    # round 5: intensity + short blocks is REAL now — the round trip
    # must produce stereo output (full laws in tests/test_mpeg_l3_corners.py)
    out_is, rate_is = decode_mpeg1(
        encode_layer3(pcm, fs, intensity=True, short_blocks=True))
    assert rate_is == fs and out_is.shape[1] == 2
    with pytest.raises(ValueError):
        encode_layer3(pcm[:, 0], fs, intensity=True)  # needs 2 ch


def test_mpeg1_layer3_bit_reservoir():
    """reservoir=True framing: one fixed bitrate, main_data_begin
    ACTUALLY borrows (quiet frames bank slack, the loud frame spends
    it), the pointer respects its 9-bit/511-byte cap, and the decode
    round-trips through the reservoir store."""
    import struct

    import numpy as np

    from gigaspark.functions.mpeg_audio import (BITRATES_L3, decode_mpeg1,
                                                encode_layer3)

    D = 576
    t = np.arange(1152) / 32000.0
    quiet = 0.001 * np.sin(2 * np.pi * 440.0 * t)
    loud = (0.9 * np.sin(2 * np.pi * 700.0 * t)
            + 0.3 * np.sin(2 * np.pi * 1900.0 * t))
    sig = np.concatenate([quiet, loud, quiet, 0.8 * loud])
    enc = encode_layer3(sig, 32000, reservoir=True)

    pos, hdrs = 0, []
    while pos + 4 <= len(enc):
        h = struct.unpack(">I", enc[pos:pos + 4])[0]
        assert h >> 20 == 0xFFF
        br = (h >> 12) & 0xF
        mdb = ((enc[pos + 4] << 1) | (enc[pos + 5] >> 7)) & 0x1FF
        hdrs.append((br, mdb))
        pos += 144 * BITRATES_L3[br] * 1000 // 32000
    assert len(hdrs) == 4
    assert len({br for br, _ in hdrs}) == 1          # ONE fixed bitrate
    assert hdrs[0][1] == 0                            # nothing to borrow yet
    assert any(mdb > 0 for _, mdb in hdrs[1:])        # reservoir USED
    assert all(mdb <= 511 for _, mdb in hdrs)

    out, rate = decode_mpeg1(enc)
    assert rate == 32000 and out.shape == (1152 * 4, 1)
    # the reservoir only re-FRAMES the identical quantized granules, so
    # its decode must equal the self-contained framing's decode EXACTLY
    plain, _ = decode_mpeg1(encode_layer3(sig, 32000))
    assert np.array_equal(out, plain)
    # and that shared decode is a faithful round-trip (loud multi-tone
    # at the 12-bit p23 cap — same bound as the noise case above)
    assert np.abs(out[D + 576:-576, 0]
                  - sig[576:len(out) - D - 576]).max() < 0.2

    # reservoir + MS compose
    st = np.stack([sig, sig * 0.5], axis=1)
    o2, _ = decode_mpeg1(encode_layer3(st, 32000, ms_stereo=True,
                                       reservoir=True))
    p2, _ = decode_mpeg1(encode_layer3(st, 32000, ms_stereo=True))
    assert np.array_equal(o2, p2)

    # a stream STARTING with a borrowing frame underruns, typed
    first_len = 144 * BITRATES_L3[hdrs[0][0]] * 1000 // 32000
    borrower = next(i for i, (_, mdb) in enumerate(hdrs) if mdb > 0)
    import pytest
    with pytest.raises(ValueError):
        decode_mpeg1(enc[first_len * borrower:])


def test_mpeg1_layer3_short_blocks():
    """block_type-2 granules: wsf/block_type/subblock_gain side-info
    layout, three 12-point MDCT windows per subband (no alias
    reduction), pinned sb-major line layout — round-trips through the
    same decode entry and composes with MS + reservoir; start/stop
    block types stay pinned out; subblock_gain scales its window."""
    import numpy as np
    import pytest

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer3

    D = 576
    t = np.arange(1152 * 4) / 32000.0
    sig = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    enc = encode_layer3(sig, 32000, short_blocks=True)
    out, rate = decode_mpeg1(enc)
    assert rate == 32000 and out.shape == (1152 * 4, 1)
    assert np.abs(out[D + 576:-576, 0]
                  - sig[576:len(out) - D - 576]).max() < 2e-3

    st = np.stack([sig, 0.3 * np.sin(2 * np.pi * 440.0 * t)], axis=1)
    o2, _ = decode_mpeg1(encode_layer3(st, 32000, ms_stereo=True,
                                       short_blocks=True))
    assert np.abs(o2[D + 576:-576]
                  - st[576:len(o2) - D - 576]).max() < 0.05

    # reservoir re-framing must not change the decode (same granules)
    a, _ = decode_mpeg1(encode_layer3(sig, 32000, short_blocks=True,
                                      reservoir=True))
    b, _ = decode_mpeg1(encode_layer3(sig, 32000, short_blocks=True))
    assert np.array_equal(a, b)

    # the raison d'être: a click's energy stays confined in time under
    # short windows vs smeared across the long 36-sample window span
    click = np.zeros(1152 * 4)
    click[2300] = 0.9
    def spread(o):
        e = np.abs(o[:, 0])
        idx = np.nonzero(e > e.max() * 0.02)[0]
        return int(idx[-1] - idx[0]) if len(idx) else 0
    cs, _ = decode_mpeg1(encode_layer3(click, 32000, short_blocks=True))
    cl, _ = decode_mpeg1(encode_layer3(click, 32000))
    assert spread(cs) < spread(cl)

    # block_type 1 (start window): pinned out, typed.  mono side info:
    # wsf at bit 51, block_type at bits 52-53 of the first granule
    bad = bytearray(enc)
    byte, shift = 4 + 52 // 8, 52 % 8
    bad[byte] = (bad[byte] & ~(0b11 << (6 - shift))) | (0b01 << (6 - shift))
    with pytest.raises(NotImplementedError):
        decode_mpeg1(bytes(bad))

    # subblock_gain: window 2 of granule 0 scaled by 2^-2 (window 0 of
    # the very first granule is all-zero MDCT history, so window 2 is
    # the first with signal) — decode must apply the law; the change
    # stays within the first frame's reach (granule + TDAC overlap)
    sb = bytearray(enc)
    sb[4 + 73 // 8] |= 1 << (7 - 73 % 8)  # sbg[2] LSB at side-info bit 73
    og, _ = decode_mpeg1(bytes(sb))
    assert not np.array_equal(og, out)
    assert np.array_equal(og[1152 + D:], out[1152 + D:])


def test_l1_l2_intensity_stereo_roundtrip():
    """Layer I/II joint (intensity) stereo: identical above-bound
    content round-trips near-transparently in fewer bytes; header mode
    is 01 with the bound encoded in mode_extension; per-channel
    scalefactors pan the shared carrier."""
    import numpy as np

    from gigaspark.functions.mpeg_audio import (decode_mpeg1,
                                                encode_layer1,
                                                encode_layer2)

    fs = 32000
    t = np.arange(4096) / fs
    low_l = 0.3 * np.sin(2 * np.pi * 200.0 * t)    # below bound, differs
    low_r = 0.3 * np.sin(2 * np.pi * 300.0 * t)
    hi = 0.5 * np.sin(2 * np.pi * 5000.0 * t)      # above bound, shared
    st = np.stack([low_l + hi, low_r + hi], axis=1)

    for enc, full_kw in ((lambda b: encode_layer1(st, fs, alloc=5,
                                                  intensity_bound=b), {}),
                         (lambda b: encode_layer2(st, fs,
                                                  intensity_bound=b), {})):
        full = enc(None)
        joint = enc(8)
        assert len(joint) < len(full)              # shared codes save bits
        assert (joint[3] >> 6) == 0b01             # mode = joint_stereo
        assert ((joint[3] >> 4) & 3) == 1          # mode_ext: bound 8
        out, rate = decode_mpeg1(joint)
        assert rate == fs and out.shape[1] == 2
        n = min(len(out), len(st))
        ref, got = st[600:n - 600], out[600:n - 600]
        err = got - ref
        snr = 10 * np.log10((ref ** 2).mean() / max((err ** 2).mean(),
                                                    1e-12))
        assert snr > 20.0, snr


def test_intensity_stereo_pans_by_scalefactor():
    """With the right channel's above-bound content quieter, the
    decoded right channel keeps less energy than the left (the
    per-channel-scalefactor panning law)."""
    import numpy as np

    from gigaspark.functions.mpeg_audio import decode_mpeg1, encode_layer1

    fs = 32000
    t = np.arange(4096) / fs
    hi = 0.6 * np.sin(2 * np.pi * 6000.0 * t)
    st = np.stack([hi, 0.15 * hi], axis=1)
    out, _ = decode_mpeg1(encode_layer1(st, fs, alloc=5, intensity_bound=4))
    n = len(out)
    el = float((out[600:n - 600, 0] ** 2).mean())
    er = float((out[600:n - 600, 1] ** 2).mean())
    assert er < el * 0.5
    # encoder guards
    import pytest
    with pytest.raises(ValueError):
        encode_layer1(st[:, :1], fs, intensity_bound=8)
    with pytest.raises(ValueError):
        encode_layer1(st, fs, intensity_bound=5)
