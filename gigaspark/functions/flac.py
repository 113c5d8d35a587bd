"""Pure-python/numpy FLAC codec (compressed audio, lossless) — subset.

Extends the audio half of the multimodal axis (SURVEY §2.8 C8;
`functions/wav.py` covers uncompressed PCM) with the most common
lossless compressed web-audio format.  Written from the public FLAC
format specification (xiph.org); unlike MP3, FLAC needs no large
spec tables, so this implementation is spec-exact end to end: streams
this encoder writes are standard FLAC, and the decoder implements the
format's documented structures.

REAL and tested here:
  * STREAMINFO metadata (dims, sample rate, MD5 of the raw PCM —
    verified on decode), metadata block framing;
  * frame headers: sync, blocksize/sample-rate codes, UTF-8-coded
    frame numbers, CRC-8; frame footer CRC-16 (both polynomials per
    spec: 0x07 and 0x8005);
  * subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC (any
    order, quantized coefficients + shift) on the decode side, with
    an encoder `lpc` option for path coverage;
  * stereo decorrelation: independent, left/side, right/side,
    mid/side channel assignments (side channel carries bps+1 bits per
    spec) on BOTH sides;
  * Rice residual coding (method 0, 4-bit parameters), partition
    orders >= 0, escape code 0b1111 -> raw 5-bit-width residuals;
  * wasted-bits field (decode side).

Subset limits, raising ValueError: 8/16-bit samples only (no 24-bit),
method-1 (5-bit) Rice, variable-blocksize streams, SEEKTABLE et al.
are skipped as unknown metadata.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ------------------------------------------------------------------ bits --


class _BW:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:          # q zeros then a one
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0                           # bit position

    def r(self, nbits: int) -> int:
        v = 0
        p = self.pos
        if p + nbits > len(self.data) * 8:
            raise ValueError("flac: truncated stream")
        for _ in range(nbits):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def signed(self, nbits: int) -> int:
        v = self.r(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        p = self.pos
        nbits = len(self.data) * 8
        while p < nbits and not (self.data[p >> 3] >> (7 - (p & 7))) & 1:
            q += 1
            p += 1
        if p >= nbits:
            raise ValueError("flac: truncated unary")
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ------------------------------------------------------------------ crc ---


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------------ utf8 --


def _utf8_num(bw: _BW, n: int) -> None:
    """FLAC's extended-UTF-8 coding of frame numbers."""
    if n < 0x80:
        bw.w(n, 8)
        return
    for total, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                        (6, 0xFC), (7, 0xFE)):
        if n < (1 << (total * 5 + 1)) or total == 7:
            bw.w(lead | (n >> (6 * (total - 1))), 8)
            for i in range(total - 2, -1, -1):
                bw.w(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return


def _utf8_num_read(br: _BR) -> int:
    b0 = br.r(8)
    if b0 < 0x80:
        return b0
    total = 0
    for t, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                    (6, 0xFC), (7, 0xFE)):
        if (b0 & ~((1 << (7 - t)) - 1)) == lead:
            total = t
    if total == 0:
        raise ValueError("flac: bad utf8 frame number")
    n = b0 & ((1 << (7 - total)) - 1)
    for _ in range(total - 1):
        c = br.r(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


# ------------------------------------------------------------ residuals ---


def _fold(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, ((-res) << 1) - 1).astype(np.int64)


def _best_rice_k(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    mean = float(u.mean())
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: _BW, res: np.ndarray, order: int, blocksize: int,
                    part_order: int) -> None:
    """Rice method 0 with 2^part_order partitions."""
    bw.w(0, 2)                         # coding method 0 (4-bit params)
    bw.w(part_order, 4)
    nparts = 1 << part_order
    base = blocksize >> part_order
    pos = 0
    for p in range(nparts):
        cnt = base - order if p == 0 else base
        u = _fold(res[pos:pos + cnt])
        pos += cnt
        k = _best_rice_k(u)
        maxq = int((u >> k).max()) if len(u) else 0
        if maxq > 48:                  # pathological: escape to raw
            width = int(u.max()).bit_length() + 1 if len(u) else 1
            width = min(max(width, 1), 31)
            bw.w(0xF, 4)
            bw.w(width, 5)
            for v in res[pos - cnt:pos]:
                bw.w(int(v) & ((1 << width) - 1), width)
        else:
            bw.w(k, 4)
            for v in u.tolist():
                bw.unary(v >> k)
                if k:
                    bw.w(v & ((1 << k) - 1), k)


def _read_residual(br: _BR, order: int, blocksize: int) -> np.ndarray:
    method = br.r(2)
    if method != 0:
        raise ValueError("flac: rice method 1 unsupported")
    part_order = br.r(4)
    nparts = 1 << part_order
    base = blocksize >> part_order
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        cnt = base - order if p == 0 else base
        k = br.r(4)
        if k == 0xF:                   # escape: raw n-bit residuals
            width = br.r(5)
            for i in range(cnt):
                out[pos + i] = br.signed(width) if width else 0
        else:
            for i in range(cnt):
                u = (br.unary() << k) | (br.r(k) if k else 0)
                out[pos + i] = (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)
        pos += cnt
    return out


# ------------------------------------------------------------ subframes ---


def _write_subframe(bw: _BW, sig: np.ndarray, bps: int, blocksize: int,
                    mode: str, part_order: int, lpc=None) -> None:
    if mode == "constant" or (mode == "auto" and len(set(sig.tolist())) == 1
                              and blocksize > 1):
        bw.w(0, 1); bw.w(0b000000, 6); bw.w(0, 1)
        bw.w(int(sig[0]) & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        bw.w(0, 1); bw.w(0b000001, 6); bw.w(0, 1)
        for v in sig.tolist():
            bw.w(int(v) & ((1 << bps) - 1), bps)
        return
    if mode == "lpc":
        coeffs, shift, prec = lpc
        order = len(coeffs)
        bw.w(0, 1); bw.w(0b100000 | (order - 1), 6); bw.w(0, 1)
        for v in sig[:order].tolist():
            bw.w(int(v) & ((1 << bps) - 1), bps)
        bw.w(prec - 1, 4)
        bw.w(shift, 5)
        for c in coeffs:
            bw.w(int(c) & ((1 << prec) - 1), prec)
        hist = sig.astype(np.int64)
        pred = np.zeros(blocksize - order, dtype=np.int64)
        for j, c in enumerate(coeffs):
            pred += int(c) * hist[order - 1 - j:blocksize - 1 - j]
        res = hist[order:] - (pred >> shift)
        _write_residual(bw, res, order, blocksize, part_order)
        return
    # FIXED: pick the order minimizing sum|residual|
    best, best_res = None, None
    sig64 = sig.astype(np.int64)
    for order, coeffs in _FIXED_COEFFS.items():
        if order >= blocksize:
            break
        res = sig64[order:].copy()
        for j, c in enumerate(coeffs):
            res -= c * sig64[order - 1 - j:blocksize - 1 - j]
        cost = int(np.abs(res).sum())
        if best is None or cost < best[1]:
            best, best_res = (order, cost), res
    order = best[0]
    bw.w(0, 1); bw.w(0b001000 | order, 6); bw.w(0, 1)
    for v in sig[:order].tolist():
        bw.w(int(v) & ((1 << bps) - 1), bps)
    po = part_order
    while (blocksize >> po) <= order or blocksize % (1 << po):
        po -= 1                        # first partition must keep >0 samples
    _write_residual(bw, best_res, order, blocksize, max(po, 0))


def _read_subframe(br: _BR, bps: int, blocksize: int) -> np.ndarray:
    if br.r(1):
        raise ValueError("flac: bad subframe padding bit")
    ty = br.r(6)
    if br.r(1):                        # wasted bits: unary count - 1
        wasted = 1 + br.unary()
    else:
        wasted = 0
    bps -= wasted
    if ty == 0b000000:                 # CONSTANT
        v = br.signed(bps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ty == 0b000001:               # VERBATIM
        out = np.array([br.signed(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 0b001000 <= ty <= 0b001100:   # FIXED order 0-4
        order = ty & 0x07
        warm = [br.signed(bps) for _ in range(order)]
        res = _read_residual(br, order, blocksize)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            p = sum(c * out[i - 1 - j] for j, c in enumerate(coeffs))
            out[i] = res[i - order] + p
    elif ty & 0b100000:                # LPC
        order = (ty & 0x1F) + 1
        warm = [br.signed(bps) for _ in range(order)]
        prec = br.r(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coeffs = [br.signed(prec) for _ in range(order)]
        res = _read_residual(br, order, blocksize)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            p = sum(c * out[i - 1 - j] for j, c in enumerate(coeffs))
            out[i] = res[i - order] + (p >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {ty:#08b}")
    return out << wasted


# ------------------------------------------------------------------ api ---


def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                blocksize: int = 4096, stereo: str = "independent",
                mode: str = "auto", part_order: int = 0, lpc=None) -> bytes:
    """samples float in [-1, 1], shape (n,) or (n, channels<=2) → FLAC.

    stereo: 'independent' | 'left_side' | 'right_side' | 'mid_side';
    mode: 'auto' (constant/best-fixed) | 'verbatim' | 'lpc' (with
    lpc=(coeffs, shift, precision)).
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch not in (1, 2):
        raise ValueError("flac: 1 or 2 channels only")
    if ch == 1:
        stereo = "independent"
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int64)
    bps = 16

    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    # STREAMINFO (34 bytes)
    si = _BW()
    si.w(blocksize, 16); si.w(blocksize, 16)
    si.w(0, 24); si.w(0, 24)
    si.w(sample_rate, 20); si.w(ch - 1, 3); si.w(bps - 1, 5)
    si.w(n, 36)
    info = si_bytes = None
    si_bytes = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(si_bytes))[1:] + si_bytes

    assign = {"independent": None, "left_side": 0b1000,
              "right_side": 0b1001, "mid_side": 0b1010}[stereo]
    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        blk = pcm[pos:pos + bs]
        hdr = _BW()
        hdr.w(0b11111111111110, 14)    # sync
        hdr.w(0, 1)                    # reserved
        hdr.w(0, 1)                    # fixed-blocksize stream
        hdr.w(0b0111, 4)               # blocksize: 16-bit value-1 follows
        hdr.w(0b0000, 4)               # sample rate: from STREAMINFO
        hdr.w(assign if assign is not None else (ch - 1), 4)
        hdr.w(0b100, 3)                # 16 bps
        hdr.w(0, 1)                    # reserved
        _utf8_num(hdr, frame_idx)
        hdr.w(bs - 1, 16)
        hdr_bytes = hdr.bytes()
        fw = _BW()
        for b in hdr_bytes:
            fw.w(b, 8)
        fw.w(_crc8(hdr_bytes), 8)

        if assign is None:
            chans = [(blk[:, c], bps) for c in range(ch)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        for sig, cbps in chans:
            _write_subframe(fw, sig, cbps, bs, mode, part_order, lpc)
        fw.align()
        body = fw.bytes()
        out += body + struct.pack(">H", _crc16(body))
        frame_idx += 1
        pos += bs
    return bytes(out)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate).  Verifies the STREAMINFO PCM MD5."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("flac: missing STREAMINFO")
    br = _BR(streaminfo)
    br.r(16); br.r(16); br.r(24); br.r(24)
    rate = br.r(20)
    ch = br.r(3) + 1
    bps = br.r(5) + 1
    total = br.r(36)
    md5_expect = streaminfo[18:34]
    if bps not in (8, 16):
        raise ValueError("flac: only 8/16-bit supported")

    out = np.zeros((total, ch), dtype=np.int64)
    got = 0
    fr = _BR(data[pos:])
    while got < total:
        hdr_start = fr.pos
        if fr.r(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        fr.r(1)
        if fr.r(1):
            raise ValueError("flac: variable-blocksize streams unsupported")
        bs_code = fr.r(4)
        sr_code = fr.r(4)
        assign = fr.r(4)
        if fr.r(3) not in (0b100, 0b001, 0b000):
            raise ValueError("flac: unsupported frame sample size")
        fr.r(1)
        _utf8_num_read(fr)
        if bs_code == 0b0110:
            bs = fr.r(8) + 1
        elif bs_code == 0b0111:
            bs = fr.r(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        if sr_code == 0b1100:
            fr.r(8)
        elif sr_code in (0b1101, 0b1110):
            fr.r(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        # CRC-8 check over the header bytes
        hdr_end = fr.pos
        hdr_bytes = bytearray()
        p = hdr_start
        assert hdr_start % 8 == 0 and hdr_end % 8 == 0
        hdr_bytes = fr.data[hdr_start // 8:hdr_end // 8]
        if fr.r(8) != _crc8(hdr_bytes):
            raise ValueError("flac: frame header CRC mismatch")

        if assign <= 0b0111:
            nch = assign + 1
            if nch != ch:
                raise ValueError("flac: channel count mismatch")
            sigs = [_read_subframe(fr, bps, bs) for _ in range(nch)]
        elif assign in (0b1000, 0b1001, 0b1010):
            if ch != 2:
                raise ValueError("flac: stereo assignment in non-stereo")
            b0 = bps + (1 if assign == 0b1001 else 0)
            b1 = bps + (1 if assign in (0b1000, 0b1010) else 0)
            c0 = _read_subframe(fr, b0, bs)
            c1 = _read_subframe(fr, b1, bs)
            if assign == 0b1000:       # left/side
                sigs = [c0, c0 - c1]
            elif assign == 0b1001:     # side/right
                sigs = [c0 + c1, c1]
            else:                      # mid/side
                side = c1
                mid = (c0 << 1) | (side & 1)
                sigs = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        fr.align()
        body = fr.data[hdr_start // 8:fr.pos // 8]
        crc = fr.r(16)
        if crc != _crc16(body):
            raise ValueError("flac: frame CRC-16 mismatch")
        take = min(bs, total - got)
        for c in range(ch):
            out[got:got + take, c] = sigs[c][:take]
        got += take

    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("flac: PCM MD5 mismatch")
    return out.astype(np.float64) / 32767.0, rate
