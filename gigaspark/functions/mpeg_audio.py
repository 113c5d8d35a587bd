"""MPEG-1 Audio Layer I codec, pure numpy (SURVEY C8 — the audio
format a real crawled corpus actually carries; closes the r2 mp3 stub
at ``multimodal.audio_features``).

Spec source: ISO/IEC 11172-3 frame layout (public).  What is SPEC-EXACT
here:

  * the 32-bit frame header (sync/ID/layer/protection/bitrate_index/
    sampling_frequency/padding/mode/...), the Layer I bitrate and
    sampling-frequency tables, and frame-length arithmetic
    ``slots = 12·bitrate/fs (+padding), bytes = 4·slots``;
  * the Layer I audio-data layout: 4-bit allocations per (channel,
    subband), 6-bit scalefactor indices, 12 granules of ``nb``-bit
    sample codes, ``nb = alloc + 1``;
  * the scalefactor law ``SF(idx) = 2 · 2^(−idx/3)`` (ISO Table B.1 is
    exactly this formula tabulated) and the Layer I requantization law
    ``x = (2s + 1 − 2^nb)/2^nb · 2^nb/(2^nb − 1)``.

PINNED DEVIATIONS (documented, swap-for-spec noted in place):

  * the 512-tap polyphase window pair (ISO Tables C.1 analysis / B.3
    synthesis) is replaced by a WINDOWLESS orthogonal DCT-IV 32-band
    filterbank — the same 32-subband split (band k centred at
    ``(k+0.5)·fs/64``) with EXACT reconstruction against this module's
    own encoder.  Real encoders' frames parse correctly (header,
    allocation, scalefactors, sample codes) but reconstruct through the
    pinned filterbank, so output vs a real encoder is band-correct, not
    bit-true.  Swapping in the two ISO tables restores bit-true
    behaviour without touching any bitstream code.
  * Layers II and III raise ``NotImplementedError``: Layer II needs
    the B.2 allocation-table family (a genuine table transcription this
    sandbox cannot verify), Layer III needs Huffman tables + IMDCT —
    both PINNED OUT, surfaced through the decode_ok=false channel.
  * joint-stereo intensity coding is pinned out (modes supported:
    stereo, dual, single).
"""

from __future__ import annotations

import struct

import numpy as np

BITRATES_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256,
               288, 320, 352, 384, 416, 448]          # kbit/s, index 1..14
SAMPLE_RATES = [44100, 48000, 32000]                  # sampling_frequency 0..2
SBANDS = 32
GRANULES = 12                                          # samples/subband/frame
FRAME_SAMPLES = SBANDS * GRANULES                      # 384


def _sf_value(idx: int) -> float:
    """ISO Table B.1 by its generating formula: 2 · 2^(−idx/3)."""
    if not 0 <= idx <= 62:
        raise ValueError(f"scalefactor index {idx} out of range")
    return 2.0 * 2.0 ** (-idx / 3.0)


# DCT-IV orthonormal filterbank (the pinned stand-in for the polyphase
# window pair): T[k, i] = sqrt(2/32)·cos(π/32·(i+0.5)·(k+0.5));
# T @ T.T = I, so synthesis is the transpose — exact reconstruction.
_T = np.sqrt(2.0 / SBANDS) * np.cos(
    np.pi / SBANDS
    * np.outer(np.arange(SBANDS) + 0.5, np.arange(SBANDS) + 0.5)).T


def _analysis(pcm: np.ndarray) -> np.ndarray:
    """[n·32] mono PCM → [n, 32] subband samples (n granules)."""
    blocks = pcm.reshape(-1, SBANDS)
    return blocks @ _T.T


def _synthesis(sub: np.ndarray) -> np.ndarray:
    """[n, 32] subband samples → [n·32] mono PCM."""
    return (sub @ _T).reshape(-1)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def pad_to(self, total_bytes: int):
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        if len(self.buf) > total_bytes:
            raise ValueError("frame overflow")
        self.buf.extend(b"\x00" * (total_bytes - len(self.buf)))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit cursor

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _frame_bytes(bitrate_kbps: int, fs: int, padding: int) -> int:
    return (12 * bitrate_kbps * 1000 // fs + padding) * 4


def encode_layer1(samples: np.ndarray, sample_rate: int = 32000,
                  alloc: int = 7) -> bytes:
    """Encode float PCM in [-1, 1] (shape [n] or [n, ch], ch ≤ 2) as
    MPEG-1 Layer I with a flat allocation of ``alloc`` (→ ``alloc+1``
    bits per sample code) across all 32 subbands.  Picks the smallest
    standard bitrate whose frame holds the data; raises if none fits
    (lower ``alloc`` or channel count)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 2:
        raise ValueError("at most 2 channels")
    if sample_rate not in SAMPLE_RATES:
        raise ValueError(f"unsupported rate {sample_rate}")
    if not 1 <= alloc <= 14:
        raise ValueError("alloc must be 1..14")
    nb = alloc + 1
    # pad to whole frames
    pad = (-n) % FRAME_SAMPLES
    if pad:
        samples = np.vstack([samples, np.zeros((pad, ch))])
    data_bits = ch * (SBANDS * 4 + SBANDS * 6 + GRANULES * SBANDS * nb)
    need = 4 + (data_bits + 7) // 8
    br_idx = next((i for i in range(1, 15)
                   if _frame_bytes(BITRATES_L1[i], sample_rate, 0) >= need),
                  None)
    if br_idx is None:
        raise ValueError("frame does not fit max Layer I bitrate")
    frame_len = _frame_bytes(BITRATES_L1[br_idx], sample_rate, 0)
    sr_idx = SAMPLE_RATES.index(sample_rate)
    mode = 3 if ch == 1 else 0  # single_channel / stereo

    out = bytearray()
    L = 1 << nb
    for f0 in range(0, samples.shape[0], FRAME_SAMPLES):
        sub = np.stack([_analysis(samples[f0:f0 + FRAME_SAMPLES, c])
                        for c in range(ch)])          # [ch, 12, 32]
        w = _BitWriter()
        # header: sync(12)=0xFFF, ID(1)=1, layer(2)=0b11 (I),
        # protection(1)=1 (no CRC), bitrate(4), fs(2), padding(1)=0,
        # private(1)=0, mode(2), mode_ext(2)=0, copyright(1)=0,
        # original(1)=1, emphasis(2)=0
        w.write(0xFFF, 12); w.write(1, 1); w.write(0b11, 2); w.write(1, 1)
        w.write(br_idx, 4); w.write(sr_idx, 2); w.write(0, 1); w.write(0, 1)
        w.write(mode, 2); w.write(0, 2); w.write(0, 1); w.write(1, 1)
        w.write(0, 2)
        for c in range(ch):
            for _sb in range(SBANDS):
                w.write(alloc, 4)
        sf_idx = np.zeros((ch, SBANDS), np.int32)
        for c in range(ch):
            for sb in range(SBANDS):
                peak = float(np.abs(sub[c, :, sb]).max())
                idx = 0
                while idx < 62 and _sf_value(idx + 1) >= peak + 1e-12:
                    idx += 1
                sf_idx[c, sb] = idx
                w.write(idx, 6)
        for g in range(GRANULES):
            for sb in range(SBANDS):
                for c in range(ch):
                    x = sub[c, g, sb] / _sf_value(int(sf_idx[c, sb]))
                    # inverse of the ISO requant law (see decode)
                    s = int(np.floor((L - 1) * (x + 1.0) / 2.0 + 0.5))
                    w.write(max(0, min(L - 1, s)), nb)
        w.pad_to(frame_len)
        out.extend(w.buf)
    return bytes(out)


def decode_mpeg1(data: bytes) -> tuple[np.ndarray, int]:
    """Decode consecutive MPEG-1 Layer I frames → (samples [n, ch]
    float in [-1, 1], sample_rate).  Raises ValueError on garbage,
    NotImplementedError on Layer II/III or joint stereo (pinned out —
    see module header)."""
    if len(data) < 4:
        raise ValueError("too short for an MPEG audio frame")
    pos = 0
    chunks = []
    rate = None
    nch = None
    while pos + 4 <= len(data):
        h = struct.unpack(">I", data[pos:pos + 4])[0]
        if h >> 20 != 0xFFF:
            if chunks:
                break  # trailing junk after valid frames — stop cleanly
            raise ValueError("bad sync word")
        layer = (h >> 17) & 3
        if layer != 0b11:
            raise NotImplementedError(
                "MPEG-1 Layer II/III pinned out (see mpeg_audio header)")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        protection = (h >> 16) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid bitrate or rate")
        if mode == 1:
            raise NotImplementedError("joint stereo pinned out")
        fs = SAMPLE_RATES[sr_idx]
        ch = 1 if mode == 3 else 2
        if rate is None:
            rate, nch = fs, ch
        elif (fs, ch) != (rate, nch):
            break  # stream parameter change — stop at the clean prefix
        flen = _frame_bytes(BITRATES_L1[br_idx], fs, padding)
        if pos + flen > len(data):
            break  # truncated final frame
        r = _BitReader(data[pos:pos + flen])
        r.pos = 32
        if protection == 0:
            r.pos += 16  # CRC16 — parsed over, not checked (pinned)
        allocs = [[r.read(4) for _ in range(SBANDS)] for _ in range(ch)]
        if any(a == 15 for row in allocs for a in row):
            raise ValueError("forbidden allocation 15")
        sfs = [[_sf_value(r.read(6)) if allocs[c][sb] else 1.0
                for sb in range(SBANDS)] for c in range(ch)]
        sub = np.zeros((ch, GRANULES, SBANDS))
        for g in range(GRANULES):
            for sb in range(SBANDS):
                for c in range(ch):
                    a = allocs[c][sb]
                    if a == 0:
                        continue
                    nb = a + 1
                    L = 1 << nb
                    s = r.read(nb)
                    # ISO Layer I requantization law
                    frac = (2 * s + 1 - L) / L
                    sub[c, g, sb] = frac * L / (L - 1) * sfs[c][sb]
        pcm = np.stack([_synthesis(sub[c]) for c in range(ch)], axis=1)
        chunks.append(pcm)
        pos += flen
    if not chunks:
        raise ValueError("no complete MPEG-1 Layer I frame")
    return np.clip(np.vstack(chunks), -1.0, 1.0), rate
