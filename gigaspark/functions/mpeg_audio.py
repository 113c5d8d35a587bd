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
  * Layer II is implemented with ALL its spec mechanisms — 1152-sample
    frames, per-subband variable-width allocation fields, scfsi
    scalefactor sharing, granule GROUPING for the 3/5/9-level classes
    (one 5/7/10-bit code for 3 samples), ``slots = 144·bitrate/fs``
    framing — but the B.2 allocation-table FAMILY (which of a/b/c/d
    applies, and the exact per-subband step lists) is PINNED to the
    single table below (``_L2_NBAL``/``_L2_STEPS``, shape mirrors
    B.2a); swap those two constants for the ISO tables to be bit-true
    against real encoders.  sblimit pinned to 30.
  * Layer III is implemented with ALL its spec mechanisms — the exact
    MPEG-1 side-info layout (17/32 bytes: main_data_begin(9), scfsi,
    and per granule/channel part2_3_length(12)/big_values(9)/
    global_gain(8)/scalefac_compress(4)/window_switching(1)/
    table_select(3×5)/region counts(4+3)/preflag/scalefac_scale/
    count1table_select), the spec slen1/slen2 scalefactor-compress
    table with scfsi granule sharing, big_values (x,y)-pair Huffman
    coding with the 15+linbits ESC mechanism, the count1 (v,w,x,y)
    quadruple region, per-line sign bits, part2_3_length-bounded main
    data, the x^(4/3)·2^((global_gain−210)/4) requantization law, the
    SPEC-EXACT alias-reduction butterflies (the published 8-coefficient
    ci rotation at each subband boundary), the SPEC-EXACT 18-point
    IMDCT + sine window + TDAC overlap-add (verified to reconstruct at
    the analytic ×9 factor), and odd-subband frequency inversion —
    but the 32-table B.7 Huffman FAMILY is PINNED to one canonical
    code generated from a fixed weight law (``_l3_pair_table`` — swap
    for the ISO tables to be bit-true against real encoders), the
    count1 table is pinned to the 4-bit raw form (table-B shape), and
    the scalefactor-band partition is pinned (``_L3_SFB_LONG``).  The
    BIT RESERVOIR is real on both sides: the decoder maintains the
    511-byte main-data store and honors any main_data_begin; the
    encoder's ``reservoir=True`` framing packs byte-aligned per-frame
    main data back-to-back at one fixed bitrate with stuffing exactly
    at the pointer's 9-bit cap.  MS JOINT STEREO is real on both sides
    (mode 01 / mode_extension bit 1, (L±R)/√2 spectral matrixing).
    SHORT BLOCKS (block_type 2) are real on both sides — wsf/
    block_type/mixed/subblock_gain side-info layout, three
    50%-overlapped 12-point MDCT windows per subband, no alias
    reduction, the subblock-gain 2^(−2g) law — with the line layout
    pinned to subband-major (window, line) order (swap for the ISO
    short-sfb interleave to be bit-true) and the psychoacoustic window
    SWITCH pinned out (``short_blocks=True`` forces the whole stream;
    start/stop/mixed block types and short-block scalefactors with
    scalefac_compress≠0 raise typed NotImplementedError).
    INTENSITY STEREO is real on both sides for long blocks (mode 01 /
    mode_extension bit 0): above the bound the left channel carries
    the L+R carrier, the right channel's lines are zero and its 3-bit
    scalefactors carry is_pos, reconstructed by the spec ratio law
    tan(is_pos·π/12)/(1+tan(·)) with the zero-tail-rounded-to-sfb
    bound rule and band 21 reusing band 20's position; composable
    with MS (matrixing then applies to the sub-bound lines only); the
    encoder's bound is pinned at sfb 14 (``_L3_IS_BOUND``).
    INTENSITY + SHORT BLOCKS is REAL on both sides since round 5: the
    same carrier/is_pos scheme per (short band, window) above the
    pinned short bound ``_L3_IS_SHORT_SFB``; the tail band 12 reuses
    band 11's position; composable with MS on each window's
    sub-bound lines.
  * L1/L2 JOINT (intensity) STEREO is real on both sides: mode 01
    with the ISO bound law (4*mode_ext+4) — shared allocation and
    shared sample codes above the bound, per-channel scalefactors
    panning the (L+R)/2 carrier (normalized by the louder channel's
    scalefactor, pinned).
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
                  alloc: int = 7,
                  intensity_bound: int | None = None) -> bytes:
    """Encode float PCM in [-1, 1] (shape [n] or [n, ch], ch ≤ 2) as
    MPEG-1 Layer I with a flat allocation of ``alloc`` (→ ``alloc+1``
    bits per sample code) across all 32 subbands.  Picks the smallest
    standard bitrate whose frame holds the data; raises if none fits
    (lower ``alloc`` or channel count).

    ``intensity_bound`` (4/8/12/16, stereo input only) enables Layer I
    JOINT (intensity) STEREO — mode 01, ``mode_extension =
    (bound-4)/4``: from the bound subband up, ONE allocation field and
    ONE sample code per (granule, subband) are transmitted while
    scalefactors stay per-channel (ISO 11172-3 joint_stereo layout);
    the shared code carries (L+R)/2 normalized by the LOUDER channel's
    scalefactor (pinned), so each channel reconstructs the carrier
    panned by its own scalefactor — the spec's intensity semantics.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 2:
        raise ValueError("at most 2 channels")
    if intensity_bound is not None:
        if ch != 2:
            raise ValueError("intensity stereo needs 2 channels")
        if intensity_bound not in (4, 8, 12, 16):
            raise ValueError("bound must be 4/8/12/16")
    if sample_rate not in SAMPLE_RATES:
        raise ValueError(f"unsupported rate {sample_rate}")
    if not 1 <= alloc <= 14:
        raise ValueError("alloc must be 1..14")
    nb = alloc + 1
    # pad to whole frames
    pad = (-n) % FRAME_SAMPLES
    if pad:
        samples = np.vstack([samples, np.zeros((pad, ch))])
    bound = SBANDS if intensity_bound is None else intensity_bound
    ncodes = ch * bound + (SBANDS - bound)  # shared slots above the bound
    data_bits = ncodes * 4 + ch * SBANDS * 6 + GRANULES * ncodes * nb
    need = 4 + (data_bits + 7) // 8
    br_idx = next((i for i in range(1, 15)
                   if _frame_bytes(BITRATES_L1[i], sample_rate, 0) >= need),
                  None)
    if br_idx is None:
        raise ValueError("frame does not fit max Layer I bitrate")
    frame_len = _frame_bytes(BITRATES_L1[br_idx], sample_rate, 0)
    sr_idx = SAMPLE_RATES.index(sample_rate)
    # single_channel / stereo / joint_stereo(intensity)
    mode = 3 if ch == 1 else (1 if intensity_bound is not None else 0)
    mode_ext = 0 if intensity_bound is None else (intensity_bound - 4) // 4

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
        w.write(mode, 2); w.write(mode_ext, 2); w.write(0, 1); w.write(1, 1)
        w.write(0, 2)
        for c in range(ch):
            for _sb in range(bound):
                w.write(alloc, 4)
        for _sb in range(bound, SBANDS):    # joint region: one field
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
                if sb < bound:
                    for c in range(ch):
                        x = sub[c, g, sb] / _sf_value(int(sf_idx[c, sb]))
                        # inverse of the ISO requant law (see decode)
                        s = int(np.floor((L - 1) * (x + 1.0) / 2.0 + 0.5))
                        w.write(max(0, min(L - 1, s)), nb)
                else:
                    # intensity carrier: (L+R)/2 against the louder
                    # channel's scalefactor (smaller idx = larger sf)
                    sfm = _sf_value(int(min(sf_idx[0, sb], sf_idx[1, sb])))
                    x = (sub[0, g, sb] + sub[1, g, sb]) / 2.0 / sfm
                    s = int(np.floor((L - 1) * (x + 1.0) / 2.0 + 0.5))
                    w.write(max(0, min(L - 1, s)), nb)
        w.pad_to(frame_len)
        out.extend(w.buf)
    return bytes(out)


# ------------------------------------------------------------ Layer II ---
BITRATES_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320, 384]                          # kbit/s, index 1..14
L2_SBLIMIT = 30                                        # pinned (B.2a shape)
L2_GRANULES = 12                                       # triplets per frame
L2_FRAME_SAMPLES = SBANDS * L2_GRANULES * 3            # 1152

# PINNED TABLES — swap for ISO 11172-3 Table B.2a to be bit-true against
# real encoders.  _L2_NBAL[sb] = allocation field width; _L2_STEPS[nbal]
# = the step (level) count per allocation code 1.. (code 0 = silent).
_L2_NBAL = [4] * 11 + [3] * 12 + [2] * 7               # 30 subbands
_L2_STEPS = {
    4: [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
        65535],
    3: [3, 5, 7, 9, 15, 31, 65535],
    2: [3, 5, 65535],
}
_L2_GROUP_BITS = {3: 5, 5: 7, 9: 10}                   # grouped triplets


def _l2_frame_bytes(bitrate_kbps: int, fs: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // fs + padding


def _l2_alloc_code(sb: int) -> tuple[int, int]:
    """Encoder's pinned flat allocation: a mid-resolution code per
    subband — (code, steps)."""
    nbal = _L2_NBAL[sb]
    steps_list = _L2_STEPS[nbal]
    code = min(7, len(steps_list)) if nbal == 4 else \
        (6 if nbal == 3 else 2)
    return code, steps_list[code - 1]


def encode_layer2(samples: np.ndarray, sample_rate: int = 32000,
                  intensity_bound: int | None = None) -> bytes:
    """Encode float PCM in [-1, 1] (shape [n] or [n, ch], ch ≤ 2) as
    MPEG-1 Layer II: 1152-sample frames, pinned per-subband allocation
    (see _l2_alloc_code), scfsi scalefactor sharing, grouping for the
    3/5/9-level classes.

    ``intensity_bound`` (4/8/12/16, stereo only) enables Layer II
    JOINT (intensity) STEREO — mode 01, ``mode_extension =
    (bound-4)/4``: shared allocation + shared sample groups above the
    bound, per-channel scalefactors; the shared group carries (L+R)/2
    normalized by the louder channel's scalefactor per 12-sample third
    (pinned), mirroring the Layer I law."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 2:
        raise ValueError("at most 2 channels")
    if intensity_bound is not None:
        if ch != 2:
            raise ValueError("intensity stereo needs 2 channels")
        if intensity_bound not in (4, 8, 12, 16):
            raise ValueError("bound must be 4/8/12/16")
    if sample_rate not in SAMPLE_RATES:
        raise ValueError(f"unsupported rate {sample_rate}")
    pad = (-n) % L2_FRAME_SAMPLES
    if pad:
        samples = np.vstack([samples, np.zeros((pad, ch))])
    sr_idx = SAMPLE_RATES.index(sample_rate)
    mode = 3 if ch == 1 else (1 if intensity_bound is not None else 0)
    mode_ext = 0 if intensity_bound is None else (intensity_bound - 4) // 4
    bound = L2_SBLIMIT if intensity_bound is None else intensity_bound

    # worst-case bit need (no scfsi sharing) to pick the bitrate
    alloc_bits = (ch * sum(_L2_NBAL[sb] for sb in range(bound))
                  + sum(_L2_NBAL[sb] for sb in range(bound, L2_SBLIMIT)))
    scfsi_bits = ch * 2 * L2_SBLIMIT
    sf_bits = ch * 3 * 6 * L2_SBLIMIT
    smp_bits = 0
    for sb in range(L2_SBLIMIT):
        nslots = ch if sb < bound else 1
        _, steps = _l2_alloc_code(sb)
        if steps in _L2_GROUP_BITS:
            smp_bits += nslots * L2_GRANULES * _L2_GROUP_BITS[steps]
        else:
            smp_bits += nslots * L2_GRANULES * 3 * max(1, steps.bit_length())
    need = 4 + (alloc_bits + scfsi_bits + sf_bits + smp_bits + 7) // 8
    br_idx = next((i for i in range(1, 15)
                   if _l2_frame_bytes(BITRATES_L2[i], sample_rate, 0) >= need),
                  None)
    if br_idx is None:
        raise ValueError("frame does not fit max Layer II bitrate")
    frame_len = _l2_frame_bytes(BITRATES_L2[br_idx], sample_rate, 0)

    out = bytearray()
    for f0 in range(0, samples.shape[0], L2_FRAME_SAMPLES):
        sub = np.stack([_analysis(samples[f0:f0 + L2_FRAME_SAMPLES, c])
                        for c in range(ch)])          # [ch, 36, 32]
        w = _BitWriter()
        w.write(0xFFF, 12); w.write(1, 1); w.write(0b10, 2); w.write(1, 1)
        w.write(br_idx, 4); w.write(sr_idx, 2); w.write(0, 1); w.write(0, 1)
        w.write(mode, 2); w.write(mode_ext, 2); w.write(0, 1); w.write(1, 1)
        w.write(0, 2)
        # allocation (shared fields above the joint bound)
        for c in range(ch):
            for sb in range(bound):
                w.write(_l2_alloc_code(sb)[0], _L2_NBAL[sb])
        for sb in range(bound, L2_SBLIMIT):
            w.write(_l2_alloc_code(sb)[0], _L2_NBAL[sb])
        # scalefactors: one per 12-sample third; scfsi picks sharing
        sf_idx = np.zeros((ch, L2_SBLIMIT, 3), np.int32)
        scfsi = np.zeros((ch, L2_SBLIMIT), np.int32)
        for c in range(ch):
            for sb in range(L2_SBLIMIT):
                for part in range(3):
                    peak = float(np.abs(
                        sub[c, part * 12:(part + 1) * 12, sb]).max())
                    idx = 0
                    while idx < 62 and _sf_value(idx + 1) >= peak + 1e-12:
                        idx += 1
                    sf_idx[c, sb, part] = idx
                a, b, d = sf_idx[c, sb]
                scfsi[c, sb] = (2 if a == b == d
                                else 1 if a == b else 3 if b == d else 0)
        for c in range(ch):
            for sb in range(L2_SBLIMIT):
                w.write(int(scfsi[c, sb]), 2)
        for c in range(ch):
            for sb in range(L2_SBLIMIT):
                a, b, d = (int(x) for x in sf_idx[c, sb])
                if scfsi[c, sb] == 2:
                    w.write(a, 6)
                elif scfsi[c, sb] == 1:
                    w.write(a, 6); w.write(d, 6)
                elif scfsi[c, sb] == 3:
                    w.write(a, 6); w.write(b, 6)
                else:
                    w.write(a, 6); w.write(b, 6); w.write(d, 6)
        # samples: 12 granules of 3 (one shared group above the bound)
        def _emit(codes: list[int], steps: int) -> None:
            if steps in _L2_GROUP_BITS:
                grouped = (codes[0] + steps * codes[1]
                           + steps * steps * codes[2])
                w.write(grouped, _L2_GROUP_BITS[steps])
            else:
                nb = max(1, steps.bit_length())
                for cc in codes:
                    w.write(cc, nb)

        for g in range(L2_GRANULES):
            for sb in range(L2_SBLIMIT):
                _, steps = _l2_alloc_code(sb)
                if sb < bound:
                    for c in range(ch):
                        codes = []
                        for j in range(3):
                            t = 3 * g + j
                            sf = _sf_value(int(sf_idx[c, sb, t // 12]))
                            x = sub[c, t, sb] / sf
                            cc = int(np.floor((steps - 1) * (x + 1.0) / 2.0
                                              + 0.5))
                            codes.append(max(0, min(steps - 1, cc)))
                        _emit(codes, steps)
                else:
                    codes = []
                    for j in range(3):
                        t = 3 * g + j
                        sfm = _sf_value(int(min(sf_idx[0, sb, t // 12],
                                                sf_idx[1, sb, t // 12])))
                        x = (sub[0, t, sb] + sub[1, t, sb]) / 2.0 / sfm
                        cc = int(np.floor((steps - 1) * (x + 1.0) / 2.0
                                          + 0.5))
                        codes.append(max(0, min(steps - 1, cc)))
                    _emit(codes, steps)
        w.pad_to(frame_len)
        out.extend(w.buf)
    return bytes(out)


def _decode_layer2_frame(r: _BitReader, ch: int,
                         jbound: int | None = None) -> np.ndarray:
    """One Layer II frame body.  ``jbound`` (joint/intensity stereo,
    mode 01): from that subband up, ONE allocation field and ONE
    sample group per (granule, subband) apply to both channels while
    scalefactors stay per-channel."""
    bound = L2_SBLIMIT if jbound is None else min(L2_SBLIMIT, jbound)
    allocs = [[0] * L2_SBLIMIT for _ in range(ch)]
    for c in range(ch):
        for sb in range(bound):
            allocs[c][sb] = r.read(_L2_NBAL[sb])
    for sb in range(bound, L2_SBLIMIT):    # joint region: one field
        a = r.read(_L2_NBAL[sb])
        for c in range(ch):
            allocs[c][sb] = a
    for c in range(ch):
        for sb in range(L2_SBLIMIT):
            if allocs[c][sb] >= len(_L2_STEPS[_L2_NBAL[sb]]) + 1:
                raise ValueError("allocation code out of table")
    scfsi = [[r.read(2) if allocs[c][sb] else 0
              for sb in range(L2_SBLIMIT)] for c in range(ch)]
    sfs = np.ones((ch, L2_SBLIMIT, 3))
    for c in range(ch):
        for sb in range(L2_SBLIMIT):
            if not allocs[c][sb]:
                continue
            pat = scfsi[c][sb]
            if pat == 2:
                v = _sf_value(r.read(6))
                sfs[c, sb] = (v, v, v)
            elif pat == 1:
                v0, v2 = _sf_value(r.read(6)), _sf_value(r.read(6))
                sfs[c, sb] = (v0, v0, v2)
            elif pat == 3:
                v0, v1 = _sf_value(r.read(6)), _sf_value(r.read(6))
                sfs[c, sb] = (v0, v1, v1)
            else:
                sfs[c, sb] = (_sf_value(r.read(6)), _sf_value(r.read(6)),
                              _sf_value(r.read(6)))
    sub = np.zeros((ch, L2_GRANULES * 3, SBANDS))

    def _read_codes(sb: int, a: int) -> tuple[list[int], int]:
        steps = _L2_STEPS[_L2_NBAL[sb]][a - 1]
        if steps in _L2_GROUP_BITS:
            v = r.read(_L2_GROUP_BITS[steps])
            codes = [v % steps, (v // steps) % steps,
                     v // (steps * steps)]
            if codes[2] >= steps:
                raise ValueError("grouped code out of range")
        else:
            nb = max(1, steps.bit_length())
            codes = [r.read(nb) for _ in range(3)]
        return codes, steps

    for g in range(L2_GRANULES):
        for sb in range(L2_SBLIMIT):
            if sb < bound:
                for c in range(ch):
                    a = allocs[c][sb]
                    if not a:
                        continue
                    codes, steps = _read_codes(sb, a)
                    for j, cc in enumerate(codes):
                        t = 3 * g + j
                        frac = (2 * cc + 1 - steps) / steps
                        sub[c, t, sb] = (frac * steps / (steps - 1)
                                         * sfs[c, sb, t // 12])
            else:
                a = allocs[0][sb]
                if not a:
                    continue
                codes, steps = _read_codes(sb, a)
                for j, cc in enumerate(codes):
                    t = 3 * g + j
                    frac = (2 * cc + 1 - steps) / steps
                    for c in range(ch):
                        # intensity: shared code, per-channel sf
                        sub[c, t, sb] = (frac * steps / (steps - 1)
                                         * sfs[c, sb, t // 12])
    return sub


# ----------------------------------------------------------- Layer III ---
BITRATES_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320]                               # kbit/s, index 1..14
L3_GRANULE_LINES = 576                                 # 32 subbands × 18
L3_FRAME_SAMPLES = 2 * L3_GRANULE_LINES                # 1152

# SPEC-EXACT: slen1/slen2 per scalefac_compress (ISO 11172-3 table).
_L3_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
            (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]
# PINNED: long-block scalefactor-band widths (22 bands summing to 576;
# sfbs 0..20 carry scalefactors — slen1 for 0..10, slen2 for 11..20 —
# band 21 is the spec's scalefactor-less tail).  Swap for the ISO
# per-sample-rate partition to be bit-true against real encoders.
_L3_SFB_LONG = [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 30, 38,
                46, 54, 62, 70, 142]
_L3_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2]
# start line of each long sfb (22 entries; band 21 = scalefactor-less tail)
_L3_SFB_START = [0]
for _w in _L3_SFB_LONG[:-1]:
    _L3_SFB_START.append(_L3_SFB_START[-1] + _w)
# SPEC-EXACT intensity-stereo left-channel fraction per is_position:
# is_ratio = tan(is_pos·π/12); L = carrier·ratio/(1+ratio),
# R = carrier/(1+ratio) (ISO 11172-3 2.4.3.4.9.3); is_pos 6 → all left
_L3_IS_FRAC = [0.0] + [
    float(np.tan(p * np.pi / 12) / (1 + np.tan(p * np.pi / 12)))
    for p in range(1, 6)] + [1.0]
_L3_IS_BOUND = 110   # PINNED encoder policy: intensity from sfb 14
# PINNED: short-block scalefactor-band widths over the 192 per-window
# frequency positions (p = subband·6 + line in the pinned subband-major
# layout): 12 scalefactor-carrying bands (slen1 for 0-5, slen2 for
# 6-11) summing to 136 + a 56-position scalefactor-less tail (band 12,
# the short analogue of long band 21) — the ISO 44.1 kHz short shape,
# pinned for all rates exactly like _L3_SFB_LONG.
_L3_SFB_SHORT = [4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56]
_L3_SFB_SHORT_START = [0]
for _w in _L3_SFB_SHORT[:-1]:
    _L3_SFB_SHORT_START.append(_L3_SFB_SHORT_START[-1] + _w)
_L3_IS_SHORT_SFB = 6   # PINNED: short intensity from short sfb 6 (p=30)


def _l3_short_lines(b: int, w: int) -> np.ndarray:
    """Line indices of short band ``b`` window ``w`` in the pinned
    subband-major (window, line) layout: per-window frequency position
    p = subband·6 + k lives at line subband·18 + w·6 + k."""
    lo = _L3_SFB_SHORT_START[b]
    p = np.arange(lo, lo + _L3_SFB_SHORT[b])
    return (p // 6) * 18 + w * 6 + (p % 6)
# SPEC-EXACT: alias-reduction butterfly coefficients.
_L3_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
                   -0.0037])
_L3_CS = 1.0 / np.sqrt(1.0 + _L3_CI ** 2)
_L3_CA = _L3_CI * _L3_CS
# SPEC-EXACT: 18-point IMDCT kernel + sine window (TDAC reconstructs at
# exactly ×9 with 50% overlap-add — encoder folds the 1/9 in).
_L3_N = 36
_L3_WIN = np.sin(np.pi / _L3_N * (np.arange(_L3_N) + 0.5))
_L3_COS = np.cos(np.pi / 72.0 * np.outer(2 * np.arange(_L3_N) + 1 + 18,
                                         2 * np.arange(18) + 1))
# SPEC-EXACT: 12-point short-block MDCT kernel + sine window (three
# 50%-overlapped windows per granule; TDAC reconstructs at ×3).
_L3_WIN12 = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
_L3_COS12 = np.cos(np.pi / 24.0 * np.outer(2 * np.arange(12) + 1 + 6,
                                           2 * np.arange(6) + 1))
_L3_LINBITS = 13                                       # ESC extra (pinned)


def _l3_build_pair_table():
    """PINNED Huffman pair-code family: ONE canonical code over the 256
    (x, y) symbols (x, y ∈ 0..15, 15 = ESC marker carrying
    ``15 + linbits`` magnitudes), generated from the fixed weight law
    w = 3^−(x+y) with deterministic tie-breaks.  Mechanism (prefix code
    + linbits escapes + per-value sign bits) is spec-exact; swap this
    table for ISO B.7's table family (and honor table_select) to be
    bit-true against real encoders."""
    import heapq
    heap = [(3.0 ** -((s >> 4) + (s & 15)), s, ("leaf", s))
            for s in range(256)]
    heapq.heapify(heap)
    tick = 256
    while len(heap) > 1:
        wa, _, a = heapq.heappop(heap)
        wb, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (wa + wb, tick, ("node", a, b)))
        tick += 1
    depths = {}

    def walk(node, d):
        if node[0] == "leaf":
            depths[node[1]] = max(d, 1)
        else:
            walk(node[1], d + 1)
            walk(node[2], d + 1)
    walk(heap[0][2], 0)
    # canonical assignment ordered by (length, symbol)
    enc = {}
    code = 0
    prev_len = 0
    for length, sym in sorted((depths[s], s) for s in range(256)):
        code <<= (length - prev_len)
        enc[sym] = (code, length)
        code += 1
        prev_len = length
    tree = {}
    for sym, (c, length) in enc.items():
        node = tree
        for i in range(length - 1, 0, -1):
            node = node.setdefault((c >> i) & 1, {})
        node[c & 1] = sym
    return enc, tree


_L3_ENC, _L3_TREE = _l3_build_pair_table()


def _l3_frame_bytes(bitrate_kbps: int, fs: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // fs + padding


def _l3_alias(lines: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Spec alias-reduction butterflies (8 rotations at each of the 31
    subband boundaries); ``inverse`` is the encoder-side transpose."""
    out = lines.copy()
    ca = -_L3_CA if inverse else _L3_CA
    for sb in range(1, SBANDS):
        lo = 18 * sb - 1 - np.arange(8)
        hi = 18 * sb + np.arange(8)
        a, b = out[lo].copy(), out[hi].copy()
        out[lo] = a * _L3_CS - b * ca
        out[hi] = b * _L3_CS + a * ca
    return out


def _l3_quantize(lines: np.ndarray, gg: int) -> np.ndarray:
    step = 2.0 ** ((gg - 210) / 4.0)
    ix = np.floor(np.abs(lines / step) ** 0.75 + 0.5).astype(np.int64)
    return np.sign(lines).astype(np.int64) * np.minimum(ix, 15 + (1 << _L3_LINBITS) - 1)


def _l3_granule_bits(ix: np.ndarray) -> tuple[int, int, list]:
    """(big_values, part2_3_length, bit ops) for one quantized granule.
    Bit ops are (value, nbits) pairs ready for a _BitWriter."""
    nz = np.nonzero(ix)[0]
    big = np.nonzero(np.abs(ix) > 1)[0]
    bv_lines = (int(big[-1]) + 2) & ~1 if len(big) else 0
    last = int(nz[-1]) + 1 if len(nz) else 0
    c1_len = (max(0, last - bv_lines) + 3) & ~3
    if bv_lines + c1_len > L3_GRANULE_LINES:
        # quad padding would overrun the granule: fold the ±1 tail into
        # the big_values region instead (pairs encode ±1 fine)
        bv_lines = min(L3_GRANULE_LINES, (last + 1) & ~1)
        c1_len = 0
    bv = bv_lines // 2
    c1_end = bv_lines + c1_len
    ops: list[tuple[int, int]] = []
    for i in range(bv):
        x, y = int(ix[2 * i]), int(ix[2 * i + 1])
        xa, ya = min(abs(x), 15 + (1 << _L3_LINBITS) - 1), \
            min(abs(y), 15 + (1 << _L3_LINBITS) - 1)
        xc, yc = min(xa, 15), min(ya, 15)
        code, ln = _L3_ENC[xc * 16 + yc]
        ops.append((code, ln))
        if xc == 15:
            ops.append((xa - 15, _L3_LINBITS))
        if xa:
            ops.append((1 if x < 0 else 0, 1))
        if yc == 15:
            ops.append((ya - 15, _L3_LINBITS))
        if ya:
            ops.append((1 if y < 0 else 0, 1))
    for q0 in range(bv_lines, c1_end, 4):
        quad = [int(ix[q0 + j]) for j in range(4)]
        ops.append((sum((1 if abs(v) else 0) << (3 - j)
                        for j, v in enumerate(quad)), 4))
        for v in quad:
            if v:
                ops.append((1 if v < 0 else 0, 1))
    return bv, sum(n for _, n in ops), ops


def _l3_frame_grdata(samples, f0, ch, prev, inv, ms_stereo,
                     short_blocks=False, intensity=False,
                     short_band_sf=False):
    """Per-frame granule data (granule-major, channel-minor dicts with
    spec/gg/bv/p23/ops), MDCT + optional MS matrixing + initial
    quantization; the caller runs the rate loop.

    ``short_blocks``: block_type-2 granules — three 50%-overlapped
    12-point MDCTs per subband (6 lines each) instead of one 36-point,
    NO alias reduction (spec: butterflies apply to long blocks only).
    Line layout is PINNED to subband-major (window, line) order — swap
    for the ISO short-sfb interleave ("reordering") to be bit-true
    against real encoders."""
    gr_data = []
    for g in range(2):
        specs = []
        for c in range(ch):
            s0 = f0 + g * L3_GRANULE_LINES
            sub = (_analysis(samples[s0:s0 + L3_GRANULE_LINES, c])
                   * inv).T                # [32 sb, 18 t]
            z = np.concatenate([prev[c], sub], axis=1)       # [32, 36]
            prev[c] = sub
            if short_blocks:
                parts = []
                for w in range(3):
                    zw = z[:, 6 + 6 * w:18 + 6 * w]           # [32, 12]
                    parts.append((zw * _L3_WIN12) @ _L3_COS12 / 3.0)
                spec = np.stack(parts, axis=1).reshape(-1)    # sb-major
                specs.append(spec)
            else:
                spec = ((z * _L3_WIN) @ _L3_COS / 9.0).reshape(-1)
                specs.append(_l3_alias(spec, inverse=True))
        is_sf = None
        is_sf_short = None
        if intensity and ch == 2 and short_blocks:
            # short-block intensity: same carrier/is_pos scheme per
            # (short band, window) above the pinned short bound; the
            # tail band 12 reuses band 11's position (mirror of the
            # long path's band-21 rule)
            l_, r_ = specs[0].copy(), specs[1].copy()
            is_sf_short = [[0, 0, 0] for _ in range(12)]
            for w in range(3):
                for b in range(_L3_IS_SHORT_SFB, 13):
                    lines = _l3_short_lines(b, w)
                    if b <= 11:
                        el = float(np.abs(l_[lines]).sum())
                        er = float(np.abs(r_[lines]).sum())
                        t = 0.5 if el + er == 0.0 else el / (el + er)
                        is_sf_short[b][w] = int(np.argmin(
                            [abs(t - f) for f in _L3_IS_FRAC]))
                    l_[lines] += r_[lines]
                    r_[lines] = 0.0
            specs = [l_, r_]
        elif intensity and ch == 2:
            # intensity coding above the pinned bound: the left channel
            # carries L+R per line, the right channel's lines go to
            # zero and its SCALEFACTORS in those bands carry is_pos
            # (the quantized stereo angle); band 21 has no scalefactor
            # slot and reuses band 20's position (pinned, spec-shaped)
            l_, r_ = specs[0].copy(), specs[1].copy()
            is_sf = [0] * 21
            for b in range(14, 22):
                lo = _L3_SFB_START[b]
                hi = lo + _L3_SFB_LONG[b]
                if b <= 20:
                    el = float(np.abs(l_[lo:hi]).sum())
                    er = float(np.abs(r_[lo:hi]).sum())
                    t = 0.5 if el + er == 0.0 else el / (el + er)
                    is_sf[b] = int(np.argmin(
                        [abs(t - f) for f in _L3_IS_FRAC]))
                l_[lo:hi] += r_[lo:hi]
                r_[lo:hi] = 0.0
            specs = [l_, r_]
        if ms_stereo and ch == 2:
            # with intensity on, MS matrixes only the sub-bound lines
            # (the carrier region must stay carrier/zero)
            if is_sf_short is not None:
                # per-window sub-bound MS: matrix only lines whose
                # per-window position is below the short bound
                l, r_ = specs[0].copy(), specs[1].copy()
                for w3 in range(3):
                    sub = np.concatenate([
                        _l3_short_lines(b3, w3)
                        for b3 in range(_L3_IS_SHORT_SFB)])
                    m_, s_ = l[sub].copy(), r_[sub].copy()
                    l[sub] = (m_ + s_) / np.sqrt(2.0)
                    r_[sub] = (m_ - s_) / np.sqrt(2.0)
                specs = [l, r_]
                cut = 0
            else:
                cut = _L3_IS_BOUND if is_sf is not None else L3_GRANULE_LINES
            l, r_ = specs[0].copy(), specs[1].copy()
            m_, s_ = l[:cut].copy(), r_[:cut].copy()
            l[:cut] = (m_ + s_) / np.sqrt(2.0)
            r_[:cut] = (m_ - s_) / np.sqrt(2.0)
            specs = [l, r_]
        for c, spec in enumerate(specs):
            scomp, part2_ops = 0, []
            if short_band_sf and is_sf_short is None:
                # PINNED noise-shaping policy: per-(band, window)
                # scalefactors boost quiet short bands before
                # quantization (decode attenuates by the same law →
                # finer effective resolution where the signal is
                # small).  scomp 9 → (slen1, slen2) = (2, 2): sf in
                # 0..3 for all 12 bands, transmitted band-major
                # window-minor like the decoder reads them.
                gpeak = float(np.abs(spec).max())
                mult = np.ones(L3_GRANULE_LINES)
                sfs = [[0, 0, 0] for _ in range(12)]
                if gpeak > 0.0:
                    for b in range(12):
                        for w3 in range(3):
                            lines = _l3_short_lines(b, w3)
                            bpeak = float(np.abs(spec[lines]).max())
                            if bpeak > 0.0:
                                s = int(np.log2(gpeak / bpeak)) // 2
                                s = min(3, max(0, s))
                                sfs[b][w3] = s
                                mult[lines] = 2.0 ** (0.5 * s)
                spec = spec * mult
                scomp = 9
                part2_ops = [(sfs[b][w3], 2)
                             for b in range(12) for w3 in range(3)]
            peak = float(np.abs(spec).max())
            if peak == 0.0:
                gg = 210
            else:
                # max ix ≈ 4000 → gg; raised by the rate loop below
                gg = int(np.clip(round(
                    210 + 4 * np.log2(peak / 4000.0 ** (4.0 / 3.0))),
                    0, 255))
            bv, p23, ops = _l3_granule_bits(_l3_quantize(spec, gg))
            d = {"spec": spec, "gg": gg, "bv": bv, "p23": p23,
                 "ops": ops, "block": 2 if short_blocks else 0,
                 "scomp": scomp, "part2_ops": part2_ops}
            if is_sf is not None and c == 1:
                # scalefac_compress 3 → (slen1, slen2) = (0, 3): bands
                # 11..20 carry 3-bit scalefactors = is_pos (0 below the
                # bound), written ahead of the Huffman data (part2)
                d["scomp"] = 3
                d["part2_ops"] = [(is_sf[b], 3) for b in range(11, 21)]
            elif is_sf_short is not None and c == 1:
                # short intensity: scomp 3 → (0, 3); bands 6..11 carry
                # per-window 3-bit is_pos (band-major window-minor)
                d["scomp"] = 3
                d["part2_ops"] = [(is_sf_short[b][w3], 3)
                                  for b in range(6, 12)
                                  for w3 in range(3)]
            if d["part2_ops"]:
                d["p23"] += sum(n for _, n in d["part2_ops"])
                d["ops"] = d["part2_ops"] + d["ops"]
            gr_data.append(d)
    return gr_data


def _l3_rate_loop(gr_data, sample_rate, side_bits):
    """Raise global_gain until the frame fits the max bitrate AND each
    granule fits part2_3_length's 12-bit field (spec-real cap: 4095)."""
    budget_max = (_l3_frame_bytes(BITRATES_L3[14], sample_rate, 0) * 8
                  - 32 - side_bits)
    while (sum(d["p23"] for d in gr_data) > budget_max
           or any(d["p23"] > 4095 for d in gr_data)):
        over = [d for d in gr_data if d["p23"] > 4095]
        big = max(over or gr_data, key=lambda d: d["p23"])
        if big["gg"] >= 255:
            raise ValueError("granule does not fit max Layer III rate")
        big["gg"] = min(255, big["gg"] + 4)
        big["bv"], p3, hops = _l3_granule_bits(
            _l3_quantize(big["spec"], big["gg"]))
        part2_ops = big.get("part2_ops", [])
        big["p23"] = p3 + sum(n for _, n in part2_ops)
        big["ops"] = part2_ops + hops


def _l3_write_header_side(w, br_idx, sr_idx, mode, mode_ext, ch, mdb,
                          gr_data):
    """32-bit header + spec-exact side info for one frame."""
    w.write(0xFFF, 12); w.write(1, 1); w.write(0b01, 2); w.write(1, 1)
    w.write(br_idx, 4); w.write(sr_idx, 2); w.write(0, 1); w.write(0, 1)
    w.write(mode, 2); w.write(mode_ext, 2); w.write(0, 1); w.write(1, 1)
    w.write(0, 2)
    w.write(mdb, 9)                        # main_data_begin
    w.write(0, 5 if ch == 1 else 3)        # private bits
    for _c in range(ch):
        w.write(0, 4)                      # scfsi: no sharing
    for g in range(2):
        for c in range(ch):
            d = gr_data[g * ch + c]
            w.write(d["p23"], 12)
            w.write(d["bv"], 9)
            w.write(d["gg"], 8)
            w.write(d.get("scomp", 0), 4)  # scalefac_compress
            if d.get("block") == 2:
                w.write(1, 1)              # window_switching_flag
                w.write(2, 2)              # block_type: short
                w.write(0, 1)              # mixed_block_flag: off
                for _r in range(2):
                    w.write(1, 5)          # table_select ×2 (pinned)
                for _w in range(3):
                    w.write(0, 3)          # subblock_gain
            else:
                w.write(0, 1)              # long block
                for _r in range(3):
                    w.write(1, 5)          # table_select: pinned table
                w.write(7, 4); w.write(7, 3)  # region counts (parsed only)
            w.write(0, 1); w.write(0, 1); w.write(0, 1)


def encode_layer3(samples: np.ndarray, sample_rate: int = 32000,
                  ms_stereo: bool = False, reservoir: bool = False,
                  short_blocks: bool = False,
                  intensity: bool = False,
                  short_band_sf: bool = False) -> bytes:
    """Encode float PCM in [-1, 1] (shape [n] or [n, ch], ch ≤ 2) as
    MPEG-1 Layer III: spec side-info layout, long blocks, MDCT over the
    subband filterbank with TDAC overlap (output is therefore delayed
    by one granule = 576 samples vs the input), inverse alias
    butterflies, x^(3/4) quantization against a per-granule
    global_gain rate loop, pinned pair-Huffman + count1 coding.

    ``ms_stereo``: joint-stereo MS matrixing (mode 01, mode_extension
    bit 1) — spectra carry (L±R)/√2 mid/side channels.

    ``reservoir``: bit-reservoir framing — ONE fixed bitrate for the
    whole stream (the smallest feasible), each frame's byte-aligned
    main data placed back-to-back in the physical main-data stream so
    a loud frame borrows slack from its predecessors;
    ``main_data_begin`` points each frame at its data (≤511 bytes
    back, the field's 9-bit cap), stuffing bytes inserted exactly when
    the pointer would otherwise overflow.  Default keeps the
    self-contained main_data_begin=0 framing with a per-frame bitrate.

    ``short_blocks``: block_type-2 granules (three 12-point MDCT
    windows per subband, no alias reduction).  Forced for the whole
    stream — the spec's psychoacoustic attack-driven window SWITCH
    (and its start/stop block types 1/3) is pinned out.

    ``intensity``: intensity stereo (mode 01, mode_extension bit 0) —
    above the pinned sfb-14 bound the left channel carries L+R and the
    right channel's 3-bit scalefactors carry the quantized stereo
    position is_pos (ratio law tan(is_pos·π/12), spec 2.4.3.4.9.3);
    combinable with ``ms_stereo`` (MS then matrixes only the sub-bound
    region).  Long blocks only — intensity + ``short_blocks`` is
    pinned out (the short-sfb is_pos partition isn't implemented).
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 2:
        raise ValueError("at most 2 channels")
    if sample_rate not in SAMPLE_RATES:
        raise ValueError(f"unsupported rate {sample_rate}")
    if ms_stereo and ch != 2:
        raise ValueError("ms_stereo needs 2 channels")
    pad = (-n) % L3_FRAME_SAMPLES
    if pad:
        samples = np.vstack([samples, np.zeros((pad, ch))])
    sr_idx = SAMPLE_RATES.index(sample_rate)
    if intensity and ch != 2:
        raise ValueError("intensity stereo needs 2 channels")
    mode = 3 if ch == 1 else (1 if (ms_stereo or intensity) else 0)
    mode_ext = (2 if ms_stereo else 0) | (1 if intensity else 0)
    side_bits = 136 if ch == 1 else 256
    inv = np.ones((18, SBANDS))
    inv[1::2, 1::2] = -1.0                 # odd subband, odd sample

    prev = np.zeros((ch, SBANDS, 18))
    frames = []                            # (gr_data, main-data bytes)
    for f0 in range(0, samples.shape[0], L3_FRAME_SAMPLES):
        gr_data = _l3_frame_grdata(samples, f0, ch, prev, inv, ms_stereo,
                                   short_blocks, intensity,
                                   short_band_sf)
        _l3_rate_loop(gr_data, sample_rate, side_bits)
        frames.append(gr_data)

    out = bytearray()
    if not reservoir:
        for gr_data in frames:
            need_bits = 32 + side_bits + sum(d["p23"] for d in gr_data)
            br_idx = next(
                i for i in range(1, 15)
                if _l3_frame_bytes(BITRATES_L3[i], sample_rate, 0) * 8
                >= need_bits)
            frame_len = _l3_frame_bytes(BITRATES_L3[br_idx], sample_rate, 0)
            w = _BitWriter()
            _l3_write_header_side(w, br_idx, sr_idx, mode, mode_ext, ch, 0,
                                  gr_data)
            for d in gr_data:              # main data, gr0 ch0 … gr1 chN
                for val, nb in d["ops"]:
                    w.write(val, nb)
            w.pad_to(frame_len)
            out.extend(w.buf)
        return bytes(out)

    # reservoir framing: byte-align each frame's main data, then find
    # the smallest FIXED bitrate whose per-frame capacity admits a
    # back-to-back layout under the two reservoir constraints
    # (data complete by its own frame's end; pointer ≤ 511 back)
    datas = []
    for gr_data in frames:
        mw = _BitWriter()
        for d in gr_data:
            for val, nb in d["ops"]:
                mw.write(val, nb)
        mw.pad_to((sum(d["p23"] for d in gr_data) + 7) // 8)
        datas.append(bytes(mw.buf))
    side_bytes = side_bits // 8
    for br_idx in range(1, 15):
        cap = _l3_frame_bytes(BITRATES_L3[br_idx], sample_rate, 0) \
            - 4 - side_bytes
        if cap <= 0:
            continue
        stream = bytearray()
        mdbs = []
        c_prev = 0                         # physical capacity before frame
        ok = True
        for dk in datas:
            o_k = max(len(stream), c_prev - 511)
            stream.extend(b"\x00" * (o_k - len(stream)))  # stuffing
            mdbs.append(c_prev - o_k)
            stream.extend(dk)
            c_prev += cap
            if len(stream) > c_prev:       # data not available in time
                ok = False
                break
        if not ok:
            continue
        stream.extend(b"\x00" * (c_prev - len(stream)))
        for k, gr_data in enumerate(frames):
            w = _BitWriter()
            _l3_write_header_side(w, br_idx, sr_idx, mode, mode_ext, ch,
                                  mdbs[k], gr_data)
            out.extend(w.buf)
            out.extend(stream[k * cap:(k + 1) * cap])
        return bytes(out)
    raise ValueError("stream does not fit max Layer III rate")


def _l3_read_side_info(r: _BitReader, ch: int) -> tuple[int, list[dict]]:
    mdb = r.read(9)                        # main_data_begin (reservoir)
    r.read(5 if ch == 1 else 3)
    scfsi = [[r.read(1) for _ in range(4)] for _ in range(ch)]
    grs = []
    for g in range(2):
        for c in range(ch):
            d = {"gr": g, "ch": c, "scfsi": scfsi[c]}
            d["p23"] = r.read(12)
            d["bv"] = r.read(9)
            if d["bv"] > 288:
                raise ValueError("big_values out of range")
            d["gg"] = r.read(8)
            d["scomp"] = r.read(4)
            if r.read(1):                  # window_switching_flag
                bt = r.read(2)
                mixed = r.read(1)
                if bt != 2 or mixed:
                    raise NotImplementedError(
                        "Layer III start/stop/mixed blocks pinned out")
                d["block"] = 2
                d["tables"] = [r.read(5) for _ in range(2)]
                d["sbg"] = [r.read(3) for _ in range(3)]
            else:
                d["block"] = 0
                d["tables"] = [r.read(5) for _ in range(3)]
                r.read(4); r.read(3)       # region counts (pinned family)
            d["preflag"] = r.read(1)
            d["sfscale"] = r.read(1)
            d["c1table"] = r.read(1)
            grs.append(d)
    return mdb, grs


def _l3_decode_granule(r: _BitReader, d: dict, shared_sf) -> tuple[np.ndarray, list]:
    start = r.pos
    slen1, slen2 = _L3_SLEN[d["scomp"]]
    sf = [0] * 21
    if d.get("block") == 2:
        # short blocks: scfsi is invalid (spec); scalefactors are per
        # (band, window) over the PINNED short partition — slen1 for
        # bands 0-5, slen2 for 6-11, transmitted band-major
        # window-minor (pinned order; ISO interleaves by window)
        sf_short = [[0, 0, 0] for _ in range(12)]
        if slen1 or slen2:
            for b in range(12):
                slen = slen1 if b < 6 else slen2
                if slen:
                    for w in range(3):
                        sf_short[b][w] = r.read(slen)
        d["_sf_short"] = sf_short
    else:
        # spec scfsi groups over long sfbs: 0-5, 6-10, 11-15, 16-20
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (lo, hi, slen) in enumerate(groups):
            if d["gr"] == 1 and d["scfsi"][gi]:
                sf[lo:hi] = shared_sf[d["ch"]][lo:hi]
            elif slen:
                for b in range(lo, hi):
                    sf[b] = r.read(slen)
    ix = np.zeros(L3_GRANULE_LINES, np.int64)
    for i in range(d["bv"]):
        node = _L3_TREE
        while isinstance(node, dict):
            node = node.get(r.read(1))
            if node is None:
                raise ValueError("bad Layer III Huffman code")
        xc, yc = node >> 4, node & 15
        vals = []
        for vcomp in (xc, yc):
            v = vcomp + (r.read(_L3_LINBITS) if vcomp == 15 else 0)
            if v and r.read(1):
                v = -v
            vals.append(v)
        if 2 * i + 1 >= L3_GRANULE_LINES:
            raise ValueError("big_values overruns the granule")
        ix[2 * i], ix[2 * i + 1] = vals
    line = 2 * d["bv"]
    while r.pos - start < d["p23"] and line + 3 < L3_GRANULE_LINES:
        quad = r.read(4)
        for j in range(4):
            v = (quad >> (3 - j)) & 1
            if v and r.read(1):
                v = -v
            ix[line + j] = v
        line += 4
    if r.pos - start > d["p23"]:
        raise ValueError("Layer III main data overrun")
    r.pos = start + d["p23"]
    # requantize: x^(4/3) law with global gain + scalefactor multipliers
    step = 2.0 ** ((d["gg"] - 210) / 4.0)
    xr = np.sign(ix) * np.abs(ix).astype(np.float64) ** (4.0 / 3.0) * step
    if d.get("block") == 2:
        sbg = d.get("sbg", [0, 0, 0])
        if any(sbg):
            # spec subblock gain: 2^(-2·gain) per short window; line
            # layout pinned sb-major (window, line)
            wmult = np.array([2.0 ** (-2.0 * g) for g in sbg])
            xr *= np.tile(np.repeat(wmult, 6), SBANDS)
        sf_short = d.get("_sf_short")
        if sf_short is not None and any(any(row) for row in sf_short):
            # same multiplier law as long bands, per (band, window)
            mult = np.ones(L3_GRANULE_LINES)
            for b in range(12):
                for w3 in range(3):
                    s = sf_short[b][w3]
                    if s:
                        mult[_l3_short_lines(b, w3)] = 2.0 ** (
                            -0.5 * (1 + d["sfscale"]) * s)
            xr *= mult
    elif any(sf) or d["preflag"]:
        mult = np.ones(L3_GRANULE_LINES)
        pos = 0
        for b, width in enumerate(_L3_SFB_LONG):
            if b < 21:
                tot = sf[b] + (d["preflag"] * _L3_PRETAB[b])
                mult[pos:pos + width] = 2.0 ** (
                    -0.5 * (1 + d["sfscale"]) * tot)
            pos += width
        xr *= mult
    return xr, sf


def _l3_synth_granule(xr: np.ndarray, overlap: np.ndarray,
                      short: bool = False) -> np.ndarray:
    """Requantized lines → 576 PCM: alias reduction (long blocks only),
    per-subband IMDCT + sine window + overlap-add (state in ``overlap``
    [32, 18], updated in place), odd-subband frequency inversion,
    polyphase synthesis.  Short granules run three 12-point IMDCTs per
    subband into the zero-padded 36-sample window frame (spec short
    composition: windows at offsets 6/12/18)."""
    if short:
        lines = xr.reshape(SBANDS, 3, 6)                   # sb, window, k
        y = np.zeros((SBANDS, 36))
        for w in range(3):
            seg = np.einsum("nk,sk->sn", _L3_COS12, lines[:, w, :]) \
                * _L3_WIN12                                 # [32, 12]
            y[:, 6 + 6 * w:18 + 6 * w] += seg
    else:
        lines = _l3_alias(xr).reshape(SBANDS, 18)
        y = np.einsum("nk,sk->sn", _L3_COS, lines) * _L3_WIN   # [32, 36]
    block = y[:, :18] + overlap
    overlap[:] = y[:, 18:]
    sub = block.T.copy()                                   # [18 t, 32 sb]
    sub[1::2, 1::2] *= -1.0
    return _synthesis(sub)


def _l3_istereo(xrs, sf_right, ms):
    """Intensity-stereo reconstruction (2.4.3.4.9.3): bands wholly in
    the right channel's zero tail (rounded up to a long-sfb boundary)
    split the left channel's carrier by the is_pos held in the RIGHT
    channel's scalefactor — L = carrier·frac, R = carrier·(1−frac),
    frac = tan(is_pos·π/12)/(1+tan(·)); is_pos 7 leaves the band
    untouched (intensity off there); band 21 reuses band 20's is_pos.
    With ``ms`` also set, MS matrixing applies to the sub-bound lines
    only."""
    l_, r_ = xrs[0].copy(), xrs[1].copy()
    nz = np.nonzero(r_)[0]
    rzero = int(nz[-1]) + 1 if len(nz) else 0
    bound = L3_GRANULE_LINES
    for b in range(22):
        lo = _L3_SFB_START[b]
        if lo < rzero:
            continue
        bound = min(bound, lo)
        pos = sf_right[min(b, 20)]
        if pos >= 7:
            continue
        frac = _L3_IS_FRAC[pos]
        hi = lo + _L3_SFB_LONG[b]
        carrier = l_[lo:hi].copy()
        l_[lo:hi] = carrier * frac
        r_[lo:hi] = carrier * (1.0 - frac)
    if ms:
        m_, s_ = l_[:bound].copy(), r_[:bound].copy()
        l_[:bound] = (m_ + s_) / np.sqrt(2.0)
        r_[:bound] = (m_ - s_) / np.sqrt(2.0)
    return [l_, r_]


def _l3_istereo_short(xrs, sf_short_right, ms):
    """Intensity-stereo reconstruction for block_type-2 granules: the
    same 2.4.3.4.9.3 ratio law as :func:`_l3_istereo`, applied per
    (short band, window) over the pinned short partition.  Each
    window's intensity region starts at the first short band wholly in
    that window's right-channel zero tail; is_pos rides the RIGHT
    channel's short scalefactor for the band/window (7 = off); the
    scalefactor-less tail band 12 reuses band 11's position.  With
    ``ms`` also set, MS matrixes only each window's sub-bound lines."""
    l_, r_ = xrs[0].copy(), xrs[1].copy()
    for w in range(3):
        wl = (np.arange(192) // 6) * 18 + w * 6 + (np.arange(192) % 6)
        nz = np.nonzero(r_[wl])[0]
        rzero = int(nz[-1]) + 1 if len(nz) else 0
        bound = 192
        for b in range(13):
            lo = _L3_SFB_SHORT_START[b]
            if lo < rzero:
                continue
            bound = min(bound, lo)
            pos = sf_short_right[min(b, 11)][w]
            if pos >= 7:
                continue
            frac = _L3_IS_FRAC[pos]
            lines = _l3_short_lines(b, w)
            carrier = l_[lines].copy()
            l_[lines] = carrier * frac
            r_[lines] = carrier * (1.0 - frac)
        if ms and bound:
            sub = wl[:bound]
            m_, s_ = l_[sub].copy(), r_[sub].copy()
            l_[sub] = (m_ + s_) / np.sqrt(2.0)
            r_[sub] = (m_ - s_) / np.sqrt(2.0)
    return [l_, r_]


def decode_mpeg1(data: bytes) -> tuple[np.ndarray, int]:
    """Decode consecutive MPEG-1 Layer I, II or III frames →
    (samples [n, ch] float in [-1, 1], sample_rate).  Layer III decodes
    the bit reservoir (main_data_begin, up to the 9-bit 511-byte reach),
    MS joint stereo and long-block intensity stereo.  Raises ValueError
    Layer I/II joint (intensity) stereo decodes per the ISO bound law.
    Raises ValueError on garbage, NotImplementedError on L3
    intensity-with-short-blocks (pinned out — see module header)."""
    if len(data) < 4:
        raise ValueError("too short for an MPEG audio frame")
    pos = 0
    chunks = []
    rate = None
    nch = None
    l3_overlap = None                      # per-channel IMDCT OLA state
    md_store = bytearray()                 # L3 bit-reservoir bytes
    while pos + 4 <= len(data):
        h = struct.unpack(">I", data[pos:pos + 4])[0]
        if h >> 20 != 0xFFF:
            if chunks:
                break  # trailing junk after valid frames — stop cleanly
            raise ValueError("bad sync word")
        layer = (h >> 17) & 3
        if layer == 0:
            raise ValueError("reserved layer")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        mode_ext = (h >> 4) & 3
        protection = (h >> 16) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid bitrate or rate")
        ms = istereo = False
        jbound = None                      # L1/L2 intensity bound
        if mode == 1:
            if layer == 0b01:
                ms = bool(mode_ext & 2)
                istereo = bool(mode_ext & 1)
            else:
                jbound = 4 * mode_ext + 4  # ISO 11172-3 joint bound law
        fs = SAMPLE_RATES[sr_idx]
        ch = 1 if mode == 3 else 2
        if rate is None:
            rate, nch = fs, ch
        elif (fs, ch) != (rate, nch):
            break  # stream parameter change — stop at the clean prefix
        if layer == 0b11:
            flen = _frame_bytes(BITRATES_L1[br_idx], fs, padding)
        elif layer == 0b10:
            flen = _l2_frame_bytes(BITRATES_L2[br_idx], fs, padding)
        else:
            flen = _l3_frame_bytes(BITRATES_L3[br_idx], fs, padding)
        if pos + flen > len(data):
            break  # truncated final frame
        r = _BitReader(data[pos:pos + flen])
        r.pos = 32
        if protection == 0:
            r.pos += 16  # CRC16 — parsed over, not checked (pinned)
        if layer == 0b01:
            if l3_overlap is None:
                l3_overlap = np.zeros((ch, SBANDS, 18))
            mdb, grs = _l3_read_side_info(r, ch)
            # main data sits after the (byte-aligned) side info; the
            # granule stream begins mdb bytes back into the reservoir
            md_frame = data[pos + r.pos // 8:pos + flen]
            if mdb > len(md_store):
                raise ValueError("Layer III reservoir underrun")
            if mdb:
                stream = bytes(md_store[len(md_store) - mdb:]) + md_frame
            else:
                stream = md_frame
            mr = _BitReader(stream)
            shared_sf = [[0] * 21 for _ in range(ch)]
            gpcm = {0: [], 1: []}
            for g in range(2):
                xrs, sfs_g = [], []
                for c in range(ch):
                    d = grs[g * ch + c]
                    xr, sf = _l3_decode_granule(mr, d, shared_sf)
                    xrs.append(xr)
                    sfs_g.append(sf)
                if g == 0:
                    for c in range(ch):
                        shared_sf[c] = sfs_g[c]
                if istereo:
                    if any(grs[g * ch + c].get("block") == 2
                           for c in range(ch)):
                        xrs = _l3_istereo_short(
                            xrs, grs[g * ch + 1].get(
                                "_sf_short", [[0, 0, 0]] * 12), ms)
                    else:
                        xrs = _l3_istereo(xrs, sfs_g[1], ms)
                elif ms:
                    m, s_ = xrs
                    xrs = [(m + s_) / np.sqrt(2.0),
                           (m - s_) / np.sqrt(2.0)]
                for c in range(ch):
                    gpcm[g].append(_l3_synth_granule(
                        xrs[c], l3_overlap[c],
                        short=grs[g * ch + c].get("block") == 2))
            pcm = np.vstack([np.stack(gpcm[0], axis=1),
                             np.stack(gpcm[1], axis=1)])
            chunks.append(pcm)
            md_store.extend(md_frame)
            del md_store[:-511]            # the pointer's 9-bit reach
            pos += flen
            continue
        if layer == 0b10:
            sub2 = _decode_layer2_frame(r, ch, jbound)
            pcm = np.stack([_synthesis(sub2[c]) for c in range(ch)], axis=1)
            chunks.append(pcm)
            pos += flen
            continue
        bound = SBANDS if jbound is None else min(SBANDS, jbound)
        allocs = [[0] * SBANDS for _ in range(ch)]
        for c in range(ch):
            for sb in range(bound):
                allocs[c][sb] = r.read(4)
        for sb in range(bound, SBANDS):    # joint region: one field
            a = r.read(4)
            for c in range(ch):
                allocs[c][sb] = a
        if any(a == 15 for row in allocs for a in row):
            raise ValueError("forbidden allocation 15")
        sfs = [[_sf_value(r.read(6)) if allocs[c][sb] else 1.0
                for sb in range(SBANDS)] for c in range(ch)]
        sub = np.zeros((ch, GRANULES, SBANDS))
        for g in range(GRANULES):
            for sb in range(SBANDS):
                if sb < bound:
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
                else:
                    a = allocs[0][sb]
                    if a == 0:
                        continue
                    nb = a + 1
                    L = 1 << nb
                    s = r.read(nb)
                    frac = (2 * s + 1 - L) / L
                    for c in range(ch):
                        # intensity: shared code, per-channel scalefactor
                        sub[c, g, sb] = frac * L / (L - 1) * sfs[c][sb]
        pcm = np.stack([_synthesis(sub[c]) for c in range(ch)], axis=1)
        chunks.append(pcm)
        pos += flen
    if not chunks:
        raise ValueError("no complete MPEG-1 Layer I frame")
    return np.clip(np.vstack(chunks), -1.0, 1.0), rate
