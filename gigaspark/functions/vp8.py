"""Pure-numpy lossy VP8 intra codec (WebP 'VP8 ' chunk) — subset.

Closes the last image-format stub in the multimodal axis (SURVEY §2.8
C8): web crawls carry lossy .webp, and the graft's payload axis is
image with a PSNR>=40dB lossy-format fetch invariant (BASELINE.json
input_hint).  Reference behavior: Gigablast's Images.cpp decodes
thumbnails of every web format [U]; this module is the Spark-side
analogue for the VP8 keyframe flavor.

STRUCTURE follows the public bitstream spec (RFC 6386): boolean
arithmetic coder, keyframe uncompressed header (frame tag + 0x9d012a
start code + 14-bit dims), bool-coded feature header, per-macroblock
intra modes (16x16 DC/V/H/TM and per-4x4 B_PRED with all ten
submodes), the Y2/WHT virtual block carrying luma DC for non-B_PRED
macroblocks, the 4x4 integer inverse DCT with the 20091/35468
fixed-point constants, token-tree coefficient coding with the 11-prob
node layout, coefficient bands, the left/above nonzero context rule
(ctx 0/1/2), the no-EOB-after-ZERO rule, zigzag order, per-plane
dequant with the y2dc=2*dc / y2ac=155*ac/100 relations, and 4:2:0
chroma with BT.601 studio-swing conversion.

PINNED (repo constants, NOT the RFC values — one swappable block at
the top of this file): the default token probabilities (the RFC's
1056-entry table is not transcribable in this sandbox — no spec text,
no libwebp), mode-tree probabilities, and the quantizer lookup tables.
Probability tables only steer arithmetic-coder efficiency, never
decodability, so encoder+decoder here are exactly self-consistent;
interop with libwebp needs only dropping in the RFC tables.  Honest
limits, raising ValueError: interframes, segmentation, multiple token
partitions, and loop-filter levels > 0 (the encoder always signals
level 0, which the spec defines as filter-off).

Scale note: this codec runs inside mapInPandas batches
(operators/multimodal.py) — per-row Python is confined to the Arrow
batch loop, the same pattern as the jpeg/gif/VP8L codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ #
# PINNED TABLES — swap for the RFC 6386 values for libwebp interop    #
# ------------------------------------------------------------------ #


def _default_coeff_probs() -> np.ndarray:
    """Token-node probs per (plane 4, band 8, ctx 3): 11 node probs.
    Shaped like the spec's table; values are a repo-pinned heuristic
    (higher bands / after-zero contexts skew toward EOB and zeros)."""
    p = np.zeros((4, 8, 3, 11), dtype=np.int32)
    for plane in range(4):
        for band in range(8):
            for ctx in range(3):
                not_eob = 255 - min(200, 28 * band + (60 if ctx == 0 else 0))
                zero = 110 + 12 * band - 25 * ctx
                p[plane, band, ctx] = [
                    max(1, not_eob),              # 0: not-EOB
                    int(np.clip(zero, 1, 254)),   # 1: not-zero
                    160, 180, 150, 140,           # 2: |v|=1  3: 2-4 vs cats  4: 2 vs 3/4  5: 3 vs 4
                    170, 150, 140, 130, 128,      # 6..10: category selector
                ]
    return p


DEFAULT_COEFF_PROBS = _default_coeff_probs()

# mode coding: pinned flat probabilities (structure per spec, probs ours)
P_IS_BPRED = 145          # ymode: B_PRED vs 16x16 set
P_YMODE = (150, 128)      # 2 bools over {DC, V, H, TM}
P_UVMODE = (142, 128)     # 2 bools over {DC, V, H, TM}
P_BMODE = (120, 128, 128, 128)  # 4 bools -> submode index 0..9

# quantizer lookups, index 0..127 (monotone; qi=0 ~ near-lossless).
# The minimum of 4 is load-bearing, not cosmetic: the WHT/DCT integer
# transforms have ~8x gain, so coefficients reach ~8160; dividing by
# >=4 keeps every quantized value inside the token range (cat6 caps
# |coeff| at 2114) — the same invariant the RFC's tables encode.
DC_QLOOKUP = np.array([4 + i for i in range(128)], dtype=np.int32)
AC_QLOOKUP = np.array([4 + 2 * i for i in range(128)], dtype=np.int32)

ZIGZAG = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
COEFF_BANDS = np.array([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])

# token categories: (base_value, n_extra_bits); cat6 caps |coeff| at 2114
CATS = [(5, 1), (7, 2), (11, 3), (19, 4), (35, 5), (67, 11)]
MAX_COEFF = CATS[-1][0] + (1 << CATS[-1][1]) - 1

YMODES = ("DC", "V", "H", "TM")
BMODES = ("B_DC", "B_TM", "B_VE", "B_HE", "B_LD", "B_RD",
          "B_VR", "B_VL", "B_HD", "B_HU")

START_CODE = b"\x9d\x01\x2a"


# ------------------------------------------------------------------ #
# boolean arithmetic coder (RFC 6386 §7)                              #
# ------------------------------------------------------------------ #


class BoolEncoder:
    """Bit-granular equivalent of the spec's byte-wise encoder: one bit
    out per renormalization, carry propagated into emitted bits; the
    decoder below consumes the identical stream."""

    def __init__(self) -> None:
        self.low = 0             # 16-bit window
        self.range = 255
        self.bits = bytearray()  # emitted bits (0/1)

    def encode(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split << 8
            self.range -= split
        else:
            self.range = split
        if self.low >= 1 << 16:           # carry into emitted bits
            self.low -= 1 << 16
            i = len(self.bits) - 1
            while self.bits[i] == 1:
                self.bits[i] = 0
                i -= 1
            self.bits[i] = 1
        while self.range < 128:
            self.bits.append((self.low >> 15) & 1)
            self.low = (self.low << 1) & 0xFFFF
            self.range <<= 1

    def literal(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.encode((value >> i) & 1, 128)

    def finish(self) -> bytes:
        for _ in range(16):               # flush the window
            self.bits.append((self.low >> 15) & 1)
            self.low = (self.low << 1) & 0xFFFF
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


class BoolDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 16
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255

    def _next_bit(self) -> int:
        byte = self.bitpos >> 3
        if byte >= len(self.data):
            self.bitpos += 1
            return 0                       # read past end as zeros
        bit = (self.data[byte] >> (7 - (self.bitpos & 7))) & 1
        self.bitpos += 1
        return bit

    def decode(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.value -= big
            self.range -= split
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value = ((self.value << 1) | self._next_bit()) & 0xFFFF
            self.range <<= 1
        return bit

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode(128)
        return v


# ------------------------------------------------------------------ #
# transforms                                                          #
# ------------------------------------------------------------------ #


def idct4x4(block: np.ndarray) -> np.ndarray:
    """Integer inverse DCT per the spec butterfly (20091/35468)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), dtype=np.int64)
    for i in range(4):       # columns
        a1 = ip[0, i] + ip[2, i]
        b1 = ip[0, i] - ip[2, i]
        c1 = ((ip[1, i] * 35468) >> 16) - (ip[3, i] + ((ip[3, i] * 20091) >> 16))
        d1 = (ip[1, i] + ((ip[1, i] * 20091) >> 16)) + ((ip[3, i] * 35468) >> 16)
        tmp[0, i] = a1 + d1
        tmp[3, i] = a1 - d1
        tmp[1, i] = b1 + c1
        tmp[2, i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int64)
    for i in range(4):       # rows
        a1 = tmp[i, 0] + tmp[i, 2]
        b1 = tmp[i, 0] - tmp[i, 2]
        c1 = ((tmp[i, 1] * 35468) >> 16) - (tmp[i, 3] + ((tmp[i, 3] * 20091) >> 16))
        d1 = (tmp[i, 1] + ((tmp[i, 1] * 20091) >> 16)) + ((tmp[i, 3] * 35468) >> 16)
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out.astype(np.int32)


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (spec butterfly)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = ip[0, i] + ip[3, i]
        b1 = ip[1, i] + ip[2, i]
        c1 = ip[1, i] - ip[2, i]
        d1 = ip[0, i] - ip[3, i]
        tmp[0, i] = a1 + b1
        tmp[1, i] = c1 + d1
        tmp[2, i] = a1 - b1
        tmp[3, i] = d1 - c1
    out = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = tmp[i, 0] + tmp[i, 3]
        b1 = tmp[i, 1] + tmp[i, 2]
        c1 = tmp[i, 1] - tmp[i, 2]
        d1 = tmp[i, 0] - tmp[i, 3]
        out[i, 0] = (a1 + b1 + 3) >> 3
        out[i, 1] = (c1 + d1 + 3) >> 3
        out[i, 2] = (a1 - b1 + 3) >> 3
        out[i, 3] = (d1 - c1 + 3) >> 3
    return out.astype(np.int32)


def _float_inverse_matrix(int_inverse) -> np.ndarray:
    """16x16 linear map of the integer inverse transform, measured by
    probing with scaled unit vectors (truncation noise ~0 at scale)."""
    m = np.zeros((16, 16))
    scale = 1 << 12
    for j in range(16):
        e = np.zeros(16, dtype=np.int64)
        e[j] = scale
        m[:, j] = int_inverse(e.reshape(4, 4)).reshape(16) / scale
    return m


_FDCT_M = np.linalg.inv(_float_inverse_matrix(idct4x4))
_FWHT_M = np.linalg.inv(_float_inverse_matrix(iwht4x4))


def fdct4x4(res: np.ndarray) -> np.ndarray:
    """Forward DCT = numeric inverse of the integer idct (encoder-side
    transforms are non-normative in VP8; this one minimizes roundtrip
    error against *this* idct by construction)."""
    return np.rint(_FDCT_M @ res.reshape(16).astype(np.float64)) \
        .astype(np.int64).reshape(4, 4)


def fwht4x4(res: np.ndarray) -> np.ndarray:
    return np.rint(_FWHT_M @ res.reshape(16).astype(np.float64)) \
        .astype(np.int64).reshape(4, 4)


# ------------------------------------------------------------------ #
# quantization                                                        #
# ------------------------------------------------------------------ #


def quant_factors(qi: int) -> dict[str, int]:
    qi = int(np.clip(qi, 0, 127))
    dc = int(DC_QLOOKUP[qi])
    ac = int(AC_QLOOKUP[qi])
    return {"ydc": dc, "yac": ac,
            "y2dc": dc * 2, "y2ac": max(8, ac * 155 // 100),
            "uvdc": dc, "uvac": ac}


def _quantize(co: np.ndarray, dcq: int, acq: int) -> np.ndarray:
    q = np.full((4, 4), acq, dtype=np.int64)
    q[0, 0] = dcq
    out = np.sign(co) * ((np.abs(co) + q // 2) // q)   # round to nearest
    return np.clip(out, -MAX_COEFF, MAX_COEFF).astype(np.int32)


def _dequantize(qc: np.ndarray, dcq: int, acq: int) -> np.ndarray:
    q = np.full((4, 4), acq, dtype=np.int32)
    q[0, 0] = dcq
    return (qc * q).astype(np.int32)


# ------------------------------------------------------------------ #
# intra prediction (shared encoder/decoder — closed loop)             #
# ------------------------------------------------------------------ #


def _predict_block(rec: np.ndarray, x: int, y: int, size: int,
                   mode: str) -> np.ndarray:
    """Predict size x size at (y, x) from reconstructed neighbors.
    Edge fills per spec: missing above = 127, missing left = 129."""
    above = np.full(size, 127, dtype=np.int32)
    left = np.full(size, 129, dtype=np.int32)
    al = 127
    if y > 0:
        above = rec[y - 1, x:x + size].astype(np.int32)
    if x > 0:
        left = rec[y:y + size, x - 1].astype(np.int32)
        al = int(rec[y - 1, x - 1]) if y > 0 else 129
    if mode == "DC":
        if y > 0 and x > 0:
            dc = (int(above.sum()) + int(left.sum()) + size) // (2 * size)
        elif y > 0:
            dc = (int(above.sum()) + size // 2) // size
        elif x > 0:
            dc = (int(left.sum()) + size // 2) // size
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == "V":
        return np.tile(above, (size, 1))
    if mode == "H":
        return np.tile(left.reshape(-1, 1), (1, size))
    if mode == "TM":
        return np.clip(left.reshape(-1, 1) + above.reshape(1, -1) - al, 0, 255)
    raise ValueError(f"vp8: unknown prediction mode {mode!r}")


def _bpred_block(rec: np.ndarray, x: int, y: int, mode: str) -> np.ndarray:
    """4x4 B_PRED submodes.  `above-right` comes from the reconstructed
    row above, edge-replicated (shared enc/dec, so exactly mirrored)."""
    h, w = rec.shape
    a = np.full(8, 127, dtype=np.int64)   # above + above-right
    L = np.full(4, 129, dtype=np.int64)
    al = 127
    if y > 0:
        a[:4] = rec[y - 1, x:x + 4]
        xr = min(x + 8, w)
        n = xr - (x + 4)
        if n > 0:
            a[4:4 + n] = rec[y - 1, x + 4:xr]
        a[4 + max(0, n):] = a[4 + max(0, n) - 1]
    if x > 0:
        L = rec[y:y + 4, x - 1].astype(np.int64)
        al = int(rec[y - 1, x - 1]) if y > 0 else 129
    p = np.empty((4, 4), dtype=np.int64)
    if mode == "B_DC":
        p[:] = (int(a[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == "B_TM":
        p[:] = np.clip(L.reshape(-1, 1) + a[:4].reshape(1, -1) - al, 0, 255)
    elif mode == "B_VE":
        lft = np.array([al, a[0], a[1], a[2]], dtype=np.int64)
        rgt = np.array([a[1], a[2], a[3], a[4]], dtype=np.int64)
        p[:] = ((lft + 2 * a[:4] + rgt + 2) >> 2).reshape(1, -1)
    elif mode == "B_HE":
        up = np.array([al, L[0], L[1], L[2]], dtype=np.int64)
        dn = np.array([L[1], L[2], L[3], L[3]], dtype=np.int64)
        p[:] = ((up + 2 * L + dn + 2) >> 2).reshape(-1, 1)
    elif mode == "B_LD":
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    p[r, c] = (a[i] + 2 * a[i + 1] + a[min(i + 2, 7)] + 2) >> 2
                else:
                    p[r, c] = (a[6] + 3 * a[7] + 2) >> 2
    elif mode == "B_RD":
        e = np.array([L[3], L[2], L[1], L[0], al, a[0], a[1], a[2], a[3]],
                     dtype=np.int64)
        for r in range(4):
            for c in range(4):
                k = 4 + c - r
                p[r, c] = (e[k - 1] + 2 * e[k] + e[min(k + 1, 8)] + 2) >> 2
    elif mode == "B_VR":
        e = np.array([L[3], L[2], L[1], L[0], al, a[0], a[1], a[2], a[3]],
                     dtype=np.int64)
        for r in range(4):
            for c in range(4):
                d = 2 * c - r
                if d >= 0 and d % 2 == 0:       # on-grid: 2-tap average
                    k = 4 + c - (r >> 1)
                    p[r, c] = (e[k] + e[min(k + 1, 8)] + 1) >> 1
                else:                            # 3-tap
                    k = 4 + c - ((r + 1) >> 1)
                    p[r, c] = (e[max(k - 1, 0)] + 2 * e[k]
                               + e[min(k + 1, 8)] + 2) >> 2
    elif mode == "B_VL":
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if r % 2 == 0:
                    p[r, c] = (a[i] + a[i + 1] + 1) >> 1
                else:
                    p[r, c] = (a[i] + 2 * a[i + 1] + a[min(i + 2, 7)] + 2) >> 2
    elif mode == "B_HD":
        e = np.array([L[3], L[2], L[1], L[0], al, a[0], a[1], a[2]],
                     dtype=np.int64)
        for r in range(4):
            for c in range(4):
                d = 2 * (3 - r) + c
                k = (d >> 1) + 1
                if d % 2 == 0:
                    p[r, c] = (e[max(k - 1, 0)] + e[k] + 1) >> 1
                else:
                    p[r, c] = (e[max(k - 2, 0)] + 2 * e[max(k - 1, 0)]
                               + e[k] + 2) >> 2
    elif mode == "B_HU":
        for r in range(4):
            for c in range(4):
                i = r * 2 + c
                if i < 6:
                    j = i >> 1
                    if i % 2 == 0:
                        p[r, c] = (L[j] + L[min(j + 1, 3)] + 1) >> 1
                    else:
                        p[r, c] = (L[j] + 2 * L[min(j + 1, 3)]
                                   + L[min(j + 2, 3)] + 2) >> 2
                else:
                    p[r, c] = L[3]
    else:
        raise ValueError(f"vp8: unknown B_PRED submode {mode!r}")
    return np.clip(p, 0, 255).astype(np.int32)


# ------------------------------------------------------------------ #
# token (coefficient) coding                                          #
# ------------------------------------------------------------------ #


def _encode_coeffs(enc: BoolEncoder, qcoeffs: np.ndarray, plane: int,
                   first: int, probs: np.ndarray, ctx0: int) -> int:
    """Encode one block's QUANTIZED coefficients [first..15] in zigzag.
    Returns the block's nonzero flag (neighbor context)."""
    zz = qcoeffs.reshape(16)[ZIGZAG][first:]
    nz = np.nonzero(zz)[0]
    last = int(nz[-1]) if len(nz) else -1
    ctx = ctx0
    prev_zero = False
    for i in range(last + 1):
        band = int(COEFF_BANDS[first + i])
        p = probs[plane, band, ctx]
        v = int(zz[i])
        if not prev_zero:
            enc.encode(1, p[0])           # not EOB
        av = abs(v)
        if av == 0:
            enc.encode(0, p[1])
            ctx = 0
            prev_zero = True
            continue
        prev_zero = False
        enc.encode(1, p[1])               # nonzero
        if av == 1:
            enc.encode(0, p[2])
            ctx = 1
        else:
            enc.encode(1, p[2])
            ctx = 2
            if av <= 4:
                enc.encode(0, p[3])
                if av == 2:
                    enc.encode(0, p[4])
                else:
                    enc.encode(1, p[4])
                    enc.encode(av - 3, p[5])
            else:
                enc.encode(1, p[3])
                for k, (base, bits) in enumerate(CATS):
                    if av <= base + (1 << bits) - 1:
                        enc.encode(k >> 2, p[6])
                        hi2 = k >> 2
                        enc.encode((k >> 1) & 1, p[7 + 2 * hi2])
                        enc.encode(k & 1, p[8 + 2 * hi2])
                        enc.literal(av - base, bits)
                        break
        enc.encode(1 if v < 0 else 0, 128)   # sign
    if last + 1 < len(zz):                   # EOB (never after a ZERO)
        band = int(COEFF_BANDS[first + last + 1])
        enc.encode(0, probs[plane, band, ctx][0])
    return 1 if last >= 0 else 0


def _decode_coeffs(dec: BoolDecoder, plane: int, first: int,
                   probs: np.ndarray, ctx0: int,
                   dcq: int, acq: int) -> tuple[np.ndarray, int]:
    """Decode one block; returns (4x4 DEQUANTIZED coeffs, nz flag)."""
    out = np.zeros(16, dtype=np.int32)
    ctx = ctx0
    prev_zero = False
    any_nz = 0
    i = first
    while i < 16:
        band = int(COEFF_BANDS[i])
        p = probs[plane, band, ctx]
        if not prev_zero and not dec.decode(p[0]):
            break                          # EOB
        if not dec.decode(p[1]):
            ctx = 0
            prev_zero = True
            i += 1
            continue
        prev_zero = False
        if not dec.decode(p[2]):
            av = 1
            ctx = 1
        else:
            ctx = 2
            if not dec.decode(p[3]):
                if not dec.decode(p[4]):
                    av = 2
                else:
                    av = 3 + dec.decode(p[5])
            else:
                hi2 = dec.decode(p[6])
                b1 = dec.decode(p[7 + 2 * hi2])
                b0 = dec.decode(p[8 + 2 * hi2])
                k = (hi2 << 2) | (b1 << 1) | b0
                if k >= len(CATS):
                    raise ValueError("vp8: bad token category")
                base, bits = CATS[k]
                av = base + dec.literal(bits)
        v = -av if dec.decode(128) else av
        out[ZIGZAG[i]] = v * (dcq if i == 0 else acq)
        any_nz = 1
        i += 1
    return out.reshape(4, 4), any_nz


# ------------------------------------------------------------------ #
# color conversion + 4:2:0 (BT.601 studio swing; shared enc/dec)      #
# ------------------------------------------------------------------ #


def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 16 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
    u = 128 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
    v = 128 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
    h, w = y.shape
    he, we = h + (h & 1), w + (w & 1)
    up = np.empty((he, we)); vp = np.empty((he, we))
    up[:h, :w] = u; vp[:h, :w] = v
    if he > h:
        up[h] = up[h - 1]; vp[h] = vp[h - 1]
    if we > w:
        up[:, w] = up[:, w - 1]; vp[:, w] = vp[:, w - 1]
    u2 = (up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2] + up[1::2, 1::2]) / 4
    v2 = (vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2] + vp[1::2, 1::2]) / 4

    def to8(arr):
        return np.clip(np.rint(arr), 0, 255).astype(np.uint8)

    return to8(y), to8(u2), to8(v2)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = y.shape
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64) - 16.0
    uf -= 128.0
    vf -= 128.0
    r = (298.082 * yf + 408.583 * vf) / 256.0
    g = (298.082 * yf - 100.291 * uf - 208.120 * vf) / 256.0
    b = (298.082 * yf + 516.412 * uf) / 256.0
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ #
# frame encode                                                        #
# ------------------------------------------------------------------ #


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    out = np.empty((ph, pw), dtype=np.int32)
    sh, sw = plane.shape
    out[:sh, :sw] = plane
    if ph > sh:
        out[sh:, :sw] = plane[sh - 1:sh, :]
    if pw > sw:
        out[:, sw:] = out[:, sw - 1:sw]
    return out


def encode_vp8_frame(rgb: np.ndarray, qi: int = 0,
                     ymode: str = "DC", bmode: str = "B_DC",
                     uvmode: str = "DC") -> bytes:
    """RGB (h, w, 3) uint8 -> VP8 keyframe payload bytes.

    Every macroblock uses `ymode` ('DC'/'V'/'H'/'TM' 16x16, or 'B' for
    B_PRED with submode `bmode` on each 4x4); chroma uses `uvmode`.
    The encoder runs the decoder's closed reconstruction loop, so
    prediction drift is structurally impossible.
    """
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("vp8: expected (h, w, 3) RGB")
    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    if not (0 < w < 16384 and 0 < h < 16384):
        raise ValueError("vp8: bad dimensions")
    use_b = ymode == "B"
    if not use_b and ymode not in YMODES:
        raise ValueError(f"vp8: bad ymode {ymode!r}")
    if uvmode not in YMODES:
        raise ValueError(f"vp8: bad uvmode {uvmode!r}")
    y, u, v = rgb_to_yuv420(rgb)
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    q = quant_factors(qi)
    probs = DEFAULT_COEFF_PROBS

    ysrc = _pad_to(y, mbh * 16, mbw * 16)
    usrc = _pad_to(u, mbh * 8, mbw * 8)
    vsrc = _pad_to(v, mbh * 8, mbw * 8)
    yrec = np.zeros_like(ysrc)
    urec = np.zeros_like(usrc)
    vrec = np.zeros_like(vsrc)

    hdr = BoolEncoder()
    hdr.encode(0)                      # color space
    hdr.encode(0)                      # clamping
    hdr.encode(0)                      # segmentation_enabled
    hdr.encode(0)                      # filter_type
    hdr.literal(0, 6)                  # loop filter level 0 = off
    hdr.literal(0, 3)                  # sharpness
    hdr.encode(0)                      # mode_lf_adjustments
    hdr.literal(0, 2)                  # log2 token partitions = 0 -> 1
    hdr.literal(int(np.clip(qi, 0, 127)), 7)   # y_ac_qi
    for _ in range(5):
        hdr.encode(0)                  # quant index deltas absent
    hdr.encode(0)                      # refresh entropy probs
    for _ in range(4 * 8 * 3 * 11):
        hdr.encode(0, 200)             # no coeff prob updates
    hdr.encode(0)                      # mb_no_coeff_skip off

    tok = BoolEncoder()

    # nonzero-context grids in sub-block units (0 outside the frame)
    nzy = np.zeros((mbh * 4, mbw * 4), dtype=np.int8)
    nzu = np.zeros((mbh * 2, mbw * 2), dtype=np.int8)
    nzv = np.zeros((mbh * 2, mbw * 2), dtype=np.int8)
    nzy2 = np.zeros((mbh, mbw), dtype=np.int8)

    def ctx_of(grid, gy, gx):
        a = int(grid[gy - 1, gx]) if gy > 0 else 0
        lf = int(grid[gy, gx - 1]) if gx > 0 else 0
        return a + lf

    uvidx = YMODES.index(uvmode)
    for my in range(mbh):
        for mx in range(mbw):
            # ---- mode bits (header partition) ----
            if use_b:
                hdr.encode(1, P_IS_BPRED)
                bidx = BMODES.index(bmode)
                for _sb in range(16):
                    for bit_i in range(4):
                        hdr.encode((bidx >> (3 - bit_i)) & 1, P_BMODE[bit_i])
            else:
                hdr.encode(0, P_IS_BPRED)
                midx = YMODES.index(ymode)
                hdr.encode(midx >> 1, P_YMODE[0])
                hdr.encode(midx & 1, P_YMODE[1])
            hdr.encode(uvidx >> 1, P_UVMODE[0])
            hdr.encode(uvidx & 1, P_UVMODE[1])

            x0, y0 = mx * 16, my * 16
            if use_b:
                # sequential 4x4: predict from reconstructed neighbors
                for sb in range(16):
                    r4, c4 = sb // 4, sb % 4
                    bx, by = x0 + c4 * 4, y0 + r4 * 4
                    pred = _bpred_block(yrec, bx, by, bmode)
                    co = fdct4x4(ysrc[by:by + 4, bx:bx + 4] - pred)
                    qc = _quantize(co, q["ydc"], q["yac"])
                    gy, gx = my * 4 + r4, mx * 4 + c4
                    nzy[gy, gx] = _encode_coeffs(
                        tok, qc, 3, 0, probs, ctx_of(nzy, gy, gx))
                    deq = _dequantize(qc, q["ydc"], q["yac"])
                    yrec[by:by + 4, bx:bx + 4] = np.clip(
                        pred + idct4x4(deq), 0, 255)
            else:
                pred16 = _predict_block(yrec, x0, y0, 16, ymode)
                res = ysrc[y0:y0 + 16, x0:x0 + 16] - pred16
                qblocks = []
                dcs = np.zeros((4, 4), dtype=np.int64)
                for sb in range(16):
                    r4, c4 = sb // 4, sb % 4
                    co = fdct4x4(res[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4])
                    dcs[r4, c4] = co[0, 0]
                    qblocks.append(_quantize(co, q["ydc"], q["yac"]))
                qy2 = _quantize(fwht4x4(dcs), q["y2dc"], q["y2ac"])
                nzy2[my, mx] = _encode_coeffs(
                    tok, qy2, 1, 0, probs, ctx_of(nzy2, my, mx))
                dcrec = iwht4x4(_dequantize(qy2, q["y2dc"], q["y2ac"]))
                for sb in range(16):
                    r4, c4 = sb // 4, sb % 4
                    gy, gx = my * 4 + r4, mx * 4 + c4
                    nzy[gy, gx] = _encode_coeffs(
                        tok, qblocks[sb], 0, 1, probs, ctx_of(nzy, gy, gx))
                    deq = _dequantize(qblocks[sb], q["ydc"], q["yac"])
                    deq[0, 0] = dcrec[r4, c4]
                    bx, by = x0 + c4 * 4, y0 + r4 * 4
                    yrec[by:by + 4, bx:bx + 4] = np.clip(
                        pred16[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4]
                        + idct4x4(deq), 0, 255)

            # ---- chroma (8x8 prediction, 4 sub-blocks each) ----
            for src, rec, grid in ((usrc, urec, nzu), (vsrc, vrec, nzv)):
                cx0, cy0 = mx * 8, my * 8
                pred8 = _predict_block(rec, cx0, cy0, 8, uvmode)
                for sb in range(4):
                    r4, c4 = sb // 2, sb % 2
                    bx, by = cx0 + c4 * 4, cy0 + r4 * 4
                    co = fdct4x4(src[by:by + 4, bx:bx + 4]
                                 - pred8[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4])
                    qc = _quantize(co, q["uvdc"], q["uvac"])
                    gy, gx = my * 2 + r4, mx * 2 + c4
                    grid[gy, gx] = _encode_coeffs(
                        tok, qc, 2, 0, probs, ctx_of(grid, gy, gx))
                    deq = _dequantize(qc, q["uvdc"], q["uvac"])
                    rec[by:by + 4, bx:bx + 4] = np.clip(
                        pred8[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4]
                        + idct4x4(deq), 0, 255)

    part1 = hdr.finish()
    part2 = tok.finish()
    if len(part1) >= 1 << 19:
        raise ValueError("vp8: header partition too large")
    tag = (0          # keyframe
           | (0 << 1)  # version
           | (1 << 4)  # show_frame
           | (len(part1) << 5))
    head = struct.pack("<I", tag)[:3] + START_CODE \
        + struct.pack("<H", w) + struct.pack("<H", h)
    return head + part1 + part2


# ------------------------------------------------------------------ #
# frame decode                                                        #
# ------------------------------------------------------------------ #


def decode_vp8_frame(data: bytes) -> np.ndarray:
    """VP8 keyframe payload -> RGB uint8 (h, w, 3)."""
    if len(data) < 10:
        raise ValueError("vp8: truncated frame")
    tag = struct.unpack("<I", data[:3] + b"\x00")[0]
    if tag & 1:
        raise ValueError("vp8: unsupported interframe")
    part1_size = tag >> 5
    if data[3:6] != START_CODE:
        raise ValueError("vp8: bad start code")
    w = struct.unpack("<H", data[6:8])[0] & 0x3FFF
    h = struct.unpack("<H", data[8:10])[0] & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("vp8: zero dimensions")
    body = data[10:]
    if len(body) < part1_size:
        raise ValueError("vp8: truncated header partition")
    hdr = BoolDecoder(body[:part1_size])
    tok = BoolDecoder(body[part1_size:])

    hdr.decode()                       # color space
    hdr.decode()                       # clamping
    if hdr.decode():
        raise ValueError("vp8: segmentation unsupported")
    hdr.decode()                       # filter_type
    if hdr.literal(6):
        raise ValueError("vp8: loop filter level > 0 unsupported")
    hdr.literal(3)                     # sharpness
    if hdr.decode():
        raise ValueError("vp8: lf adjustments unsupported")
    if hdr.literal(2):
        raise ValueError("vp8: multiple token partitions unsupported")
    qi = hdr.literal(7)
    for _ in range(5):
        if hdr.decode():
            raise ValueError("vp8: quant index deltas unsupported")
    hdr.decode()                       # refresh entropy probs
    probs = DEFAULT_COEFF_PROBS.copy()
    for plane in range(4):
        for band in range(8):
            for ctx in range(3):
                for node in range(11):
                    if hdr.decode(200):
                        probs[plane, band, ctx, node] = hdr.literal(8)
    if hdr.decode():
        raise ValueError("vp8: mb_no_coeff_skip unsupported")

    q = quant_factors(qi)
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    yrec = np.zeros((mbh * 16, mbw * 16), dtype=np.int32)
    urec = np.zeros((mbh * 8, mbw * 8), dtype=np.int32)
    vrec = np.zeros((mbh * 8, mbw * 8), dtype=np.int32)
    nzy = np.zeros((mbh * 4, mbw * 4), dtype=np.int8)
    nzu = np.zeros((mbh * 2, mbw * 2), dtype=np.int8)
    nzv = np.zeros((mbh * 2, mbw * 2), dtype=np.int8)
    nzy2 = np.zeros((mbh, mbw), dtype=np.int8)

    def ctx_of(grid, gy, gx):
        a = int(grid[gy - 1, gx]) if gy > 0 else 0
        lf = int(grid[gy, gx - 1]) if gx > 0 else 0
        return a + lf

    def tree2(dec, p2):
        return (dec.decode(p2[0]) << 1) | dec.decode(p2[1])

    for my in range(mbh):
        for mx in range(mbw):
            use_b = bool(hdr.decode(P_IS_BPRED))
            if use_b:
                submodes = []
                for _sb in range(16):
                    idx = 0
                    for bit_i in range(4):
                        idx = (idx << 1) | hdr.decode(P_BMODE[bit_i])
                    if idx >= len(BMODES):
                        raise ValueError("vp8: bad B_PRED submode")
                    submodes.append(BMODES[idx])
            else:
                ymode = YMODES[tree2(hdr, P_YMODE)]
            uvmode = YMODES[tree2(hdr, P_UVMODE)]

            x0, y0 = mx * 16, my * 16
            if use_b:
                for sb in range(16):
                    r4, c4 = sb // 4, sb % 4
                    bx, by = x0 + c4 * 4, y0 + r4 * 4
                    gy, gx = my * 4 + r4, mx * 4 + c4
                    deq, nzf = _decode_coeffs(
                        tok, 3, 0, probs, ctx_of(nzy, gy, gx),
                        q["ydc"], q["yac"])
                    nzy[gy, gx] = nzf
                    pred = _bpred_block(yrec, bx, by, submodes[sb])
                    yrec[by:by + 4, bx:bx + 4] = np.clip(
                        pred + idct4x4(deq), 0, 255)
            else:
                deqy2, nzf2 = _decode_coeffs(
                    tok, 1, 0, probs, ctx_of(nzy2, my, mx),
                    q["y2dc"], q["y2ac"])
                nzy2[my, mx] = nzf2
                dcrec = iwht4x4(deqy2)
                pred16 = _predict_block(yrec, x0, y0, 16, ymode)
                for sb in range(16):
                    r4, c4 = sb // 4, sb % 4
                    gy, gx = my * 4 + r4, mx * 4 + c4
                    deq, nzf = _decode_coeffs(
                        tok, 0, 1, probs, ctx_of(nzy, gy, gx),
                        q["ydc"], q["yac"])
                    nzy[gy, gx] = nzf
                    deq[0, 0] = dcrec[r4, c4]
                    bx, by = x0 + c4 * 4, y0 + r4 * 4
                    yrec[by:by + 4, bx:bx + 4] = np.clip(
                        pred16[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4]
                        + idct4x4(deq), 0, 255)

            for rec, grid, dcq, acq in ((urec, nzu, q["uvdc"], q["uvac"]),
                                        (vrec, nzv, q["uvdc"], q["uvac"])):
                cx0, cy0 = mx * 8, my * 8
                pred8 = _predict_block(rec, cx0, cy0, 8, uvmode)
                for sb in range(4):
                    r4, c4 = sb // 2, sb % 2
                    gy, gx = my * 2 + r4, mx * 2 + c4
                    deq, nzf = _decode_coeffs(
                        tok, 2, 0, probs, ctx_of(grid, gy, gx), dcq, acq)
                    grid[gy, gx] = nzf
                    bx, by = cx0 + c4 * 4, cy0 + r4 * 4
                    rec[by:by + 4, bx:bx + 4] = np.clip(
                        pred8[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4]
                        + idct4x4(deq), 0, 255)

    y = yrec[:h, :w].astype(np.uint8)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    return yuv420_to_rgb(y, urec[:ch, :cw].astype(np.uint8),
                         vrec[:ch, :cw].astype(np.uint8))


# ------------------------------------------------------------------ #
# RIFF WebP container                                                 #
# ------------------------------------------------------------------ #


def encode_webp_lossy(rgb: np.ndarray, qi: int = 0, ymode: str = "DC",
                      bmode: str = "B_DC", uvmode: str = "DC") -> bytes:
    payload = encode_vp8_frame(rgb, qi=qi, ymode=ymode, bmode=bmode,
                               uvmode=uvmode)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
