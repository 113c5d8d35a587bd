"""Pure-numpy H.264/AVC Baseline intra codec (Annex B) — I-frame subset.

Closes the LAST codec stub in the multimodal axis (SURVEY §2.8 C8):
a crawled video corpus is overwhelmingly H.264, and the graft's
payload invariant (BASELINE.json input_hint) wants decoded-pixel
PSNR>=40dB for lossy formats.  Reference behavior: Gigablast's
Images.cpp / media handling decodes thumbnails of whatever the crawl
fetches [U]; this module is the Spark-side analogue for AVC intra
video, feeding ``multimodal.frame_sample`` / ``scene_cuts`` the same
way avi-mjpg and gif-anim do.

SPEC-EXACT here (ITU-T H.264 / ISO 14496-10, public):

  * Annex B byte-stream framing (start codes, emulation-prevention
    0x000003 insertion/removal), NAL header (ref_idc/type), RBSP
    trailing bits;
  * exp-Golomb ue(v)/se(v) and every header field: SPS (profile 66,
    pic_order_cnt_type 2, frame cropping in 4:2:0 crop units), PPS
    (CAVLC, deblocking-control present), IDR slice header
    (slice_type 7, dec_ref_pic_marking, slice_qp_delta,
    disable_deblocking_filter_idc=1 so reconstruction is exact
    without the in-loop filter);
  * macroblock syntax: I_4x4 (prev_intra4x4_pred_mode_flag /
    rem_intra4x4_pred_mode with the min(left,above) predictor rule)
    and I_16x16 (mb_type = 1 + pred + 4*cbpChroma + 12*cbpLuma15,
    Table 7-11 layout), intra_chroma_pred_mode, mb_qp_delta;
  * intra prediction modes Vertical/Horizontal/DC for 4x4, 16x16 and
    chroma 8x8 with the spec's availability + rounding rules (other
    modes raise ValueError — this encoder never emits them);
  * the 4x4 integer core transform pair (Cf forward / the >>1
    butterfly inverse with final (x+32)>>6), the quantization MF and
    dequant V tables with the a/b/c position classes, qbits=15+QP/6,
    intra rounding f=2^qbits/3; the 4x4 Hadamard luma-DC transform
    with the normative qP>=12 / qP<12 dequant split (8.5.10); the 2x2
    chroma-DC Hadamard with its ((f*V)<<(qPc/6))>>5 dequant (8.5.11);
    the QPc mapping (Table 8-15); the 4x4 zigzag scan; the
    Intra16x16/chroma AC 15-coefficient blocks;
  * CAVLC structure: coeff_token alphabet (TotalCoeff, TrailingOnes<=3)
    with the nC neighbour-context rule nC=(nA+nB+1)>>1, the nC>=8
    six-bit FLC of Table 9-5 (spec values), trailing-one sign flags,
    the COMPLETE level_prefix/level_suffix algorithm (9.2.2.1):
    suffixLength init/adaptation 3<<(sl-1), the levelCode+2 offset for
    the first level after <3 trailing ones, the prefix-14 4-bit and
    prefix>=15 escape windows; total_zeros / run_before semantics with
    exact zerosLeft bookkeeping and the end-of-run rule.

PINNED (repo constants, NOT the spec tables — one swappable block
below): the VLC codes for coeff_token at nC<8 and nC==-1, for
total_zeros and for run_before are exp-Golomb over a pinned
deterministic symbol ordering instead of the spec's Tables 9-5..9-10
(those per-context code tables are not transcribable in this sandbox
— no spec text, no reference decoder).  Entropy-code choice only
steers compression ratio, never decodability: encoder and decoder
here are exactly self-consistent, and swapping the four ``_PIN_*``
maps for the spec tables restores bit-interop without touching any
other code.  The same pin applies to the coded_block_pattern mapping
(spec Table 9-4 permutation -> pinned identity ue(cbp)).

P SLICES are real (encode + decode): mb_skip_run coding with the
spec's P_Skip motion inference rule (predicted MV, forced zero at the
left/top edge or when a neighbour is a zero-MV/ref-0 block), inter
P_L0_16x16 macroblocks with mvd_l0 coding against the median MV
predictor (8.4.1.3: componentwise median of A/B/C with the
exactly-one-matching-ref short cut and the only-A edge rule; intra
neighbours count unavailable), intra MBs inside P slices (mb_type
offset +5), one-reference lists (the previous decoded picture), and
the FULL fractional-sample interpolation: 6-tap [1,-5,20,20,-5,1]
half-pel with (x+16)>>5 rounding, quarter-pel rounding averages, and
eighth-pel bilinear chroma with the (…+32)>>6 law.  Inter residuals
ride the same CAVLC/4x4-transform path (no luma DC Hadamard — that is
I_16x16-only, per spec), CBP carries the inter mapping pin.

Honest limits, raising ValueError: B slices, weighted prediction,
multi-reference lists, sub-16x16 inter partitions, CABAC, 8x8
transform (High profile), MBAFF/fields, I_PCM, intra modes > 2,
multiple slices per picture, odd frame dimensions (4:2:0).

Scale note: this codec runs inside mapInPandas Arrow batches
(operators/multimodal.py) — per-row Python confined to the batch
loop, the same pattern as the jpeg/gif/vp8 codecs.  A production
100 TB run swaps in a native decoder behind the same dispatch
(functions/images.py precedent).
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------------ #
# PINNED TABLES — swap for H.264 Tables 9-4/9-5/9-7/9-8/9-10 for      #
# bitstream interop with real encoders/decoders.                     #
# ------------------------------------------------------------------ #

def _coeff_token_order() -> list[tuple[int, int]]:
    """Pinned coeff_token symbol order: cheap codes for few
    coefficients and for runs of trailing ones — the shape the spec's
    per-context tables share."""
    syms = [(0, 0)]
    for total in range(1, 17):
        for t1s in range(min(3, total), -1, -1):
            syms.append((total, t1s))
    return syms


_PIN_COEFF_IDX = {s: i for i, s in enumerate(_coeff_token_order())}
_PIN_COEFF_SYM = _coeff_token_order()
# chroma DC (nC == -1): TotalCoeff <= 4, same pinned ordering filtered
_PIN_CDC_SYM = [s for s in _coeff_token_order() if s[0] <= 4]
_PIN_CDC_IDX = {s: i for i, s in enumerate(_PIN_CDC_SYM)}
# total_zeros / run_before: pinned plain exp-Golomb of the value
# (spec: per-TotalCoeff VLC tables); coded_block_pattern: pinned
# identity ue(cbp) (spec: Table 9-4 permutation).

# ------------------------------------------------------------------ #
# Spec constants (public ITU-T H.264)                                 #
# ------------------------------------------------------------------ #

# quantization multiplier MF (forward) and dequant V, per QP%6 and
# position class a/b/c — Table derived from 8.5.12.1 (spec-exact).
_MF = np.array([
    [13107, 5243, 8066], [11916, 4660, 7490], [10082, 4194, 6554],
    [9362, 3647, 5825], [8192, 3355, 5243], [7282, 2893, 4559]],
    dtype=np.int64)
_V = np.array([
    [10, 16, 13], [11, 18, 14], [13, 20, 16],
    [14, 23, 18], [16, 25, 20], [18, 29, 23]], dtype=np.int64)

# position class per (i,j): 0 at even/even corners, 1 at odd/odd, 2 mixed
_POS_CLASS = np.array([[0 if (i % 2 == 0 and j % 2 == 0) else
                        1 if (i % 2 == 1 and j % 2 == 1) else 2
                        for j in range(4)] for i in range(4)])

# 4x4 zigzag (frame) scan — spec Figure 8-8
_ZIGZAG = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3),
           (1, 2), (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3),
           (3, 2), (3, 3)]

# chroma QP from luma QP — Table 8-15
_CHROMA_QP = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                                36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                                39, 39]

# 4x4 luma block decode order within a MB (x,y in 4px units) — spec
# raster-in-quadrant ordering of blkIdx 0..15
_BLK_XY = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1),
           (3, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2),
           (2, 3), (3, 3)]

_HAD = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                 [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)


# ------------------------------------------------------------------ #
# Bit I/O + exp-Golomb                                                 #
# ------------------------------------------------------------------ #

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, v: int) -> None:
        if v < 0:
            raise ValueError("ue(v) needs v >= 0")
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def trailing(self) -> None:
        """rbsp_stop_one_bit + alignment zeros."""
        self.u(1, 1)
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned RBSP")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("bitstream truncated")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("exp-Golomb overflow")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k % 2 == 1 else -(k >> 1)


# ------------------------------------------------------------------ #
# NAL framing (Annex B)                                                #
# ------------------------------------------------------------------ #

def _rbsp_to_ebsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ebsp_to_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < len(ebsp) and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    hdr = bytes([(ref_idc << 5) | nal_type])
    return b"\x00\x00\x00\x01" + hdr + _rbsp_to_ebsp(rbsp)


def split_nals(data: bytes) -> list[tuple[int, bytes]]:
    """Annex B byte stream -> [(nal_type, rbsp)]."""
    out: list[tuple[int, bytes]] = []
    i = 0
    n = len(data)
    starts: list[int] = []
    while i + 3 <= n:
        if data[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        end = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # trim the optional 4th start-code zero of the NEXT unit
        while end > s and data[end - 1] == 0 and k + 1 < len(starts):
            end -= 1
        if end <= s:
            continue
        hdr = data[s]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        out.append((hdr & 0x1F, _ebsp_to_rbsp(data[s + 1:end])))
    if not out:
        raise ValueError("no NAL units")
    return out


# ------------------------------------------------------------------ #
# Transforms / quantization (spec-exact)                               #
# ------------------------------------------------------------------ #

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], dtype=np.int64)


def _fdct4(block: np.ndarray) -> np.ndarray:
    return _CF @ block.astype(np.int64) @ _CF.T


def _idct4(d: np.ndarray) -> np.ndarray:
    """Inverse core transform on DEQUANTIZED coefficients, with the
    spec's >>1 butterflies and the final (x+32)>>6 rounding."""
    d = d.astype(np.int64)
    # horizontal (rows of d treated as columns per spec symmetry)
    e = np.empty_like(d)
    e[0] = d[0] + d[2]
    e[1] = d[0] - d[2]
    e[2] = (d[1] >> 1) - d[3]
    e[3] = d[1] + (d[3] >> 1)
    f = np.empty_like(d)
    f[0] = e[0] + e[3]
    f[1] = e[1] + e[2]
    f[2] = e[1] - e[2]
    f[3] = e[0] - e[3]
    g = np.empty_like(f)
    g[:, 0] = f[:, 0] + f[:, 2]
    g[:, 1] = f[:, 0] - f[:, 2]
    g[:, 2] = (f[:, 1] >> 1) - f[:, 3]
    g[:, 3] = f[:, 1] + (f[:, 3] >> 1)
    h = np.empty_like(g)
    h[:, 0] = g[:, 0] + g[:, 3]
    h[:, 1] = g[:, 1] + g[:, 2]
    h[:, 2] = g[:, 1] - g[:, 2]
    h[:, 3] = g[:, 0] - g[:, 3]
    return (h + 32) >> 6


def _quant4(w: np.ndarray, qp: int) -> np.ndarray:
    mf = _MF[qp % 6][_POS_CLASS]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding
    return (np.sign(w) * ((np.abs(w) * mf + f) >> qbits)).astype(np.int64)


def _dequant4(z: np.ndarray, qp: int, skip_dc: bool = False) -> np.ndarray:
    v = _V[qp % 6][_POS_CLASS]
    d = (z.astype(np.int64) * v) << (qp // 6)
    if skip_dc:
        d[0, 0] = 0
    return d


def _luma_dc_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: inverse 4x4 Hadamard then the qP>=12 / qP<12 scaling."""
    f = _HAD @ c.astype(np.int64) @ _HAD
    v00 = int(_V[qp % 6][0])
    if qp >= 12:
        return (f * v00) << (qp // 6 - 2)
    shift = 2 - qp // 6
    return (f * v00 + (1 << (shift - 1))) >> shift


def _chroma_dc_dequant(c: np.ndarray, qpc: int) -> np.ndarray:
    """8.5.11: inverse 2x2 Hadamard then scale.  The spec's
    ((f*LevelScale)<<(qPc/6))>>5 uses LevelScale = 16*V (flat weight
    scale); with the plain V table that is >>1."""
    h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
    f = h2 @ c.astype(np.int64) @ h2
    v00 = int(_V[qpc % 6][0])
    return ((f * v00) << (qpc // 6)) >> 1


# ------------------------------------------------------------------ #
# Intra prediction (modes 0=V, 1=H, 2=DC) — encoder and decoder share #
# ------------------------------------------------------------------ #

def _pred_block(plane: np.ndarray, y: int, x: int, size: int,
                mode: int) -> np.ndarray:
    """Predict a size x size block at (y, x) from reconstructed
    neighbours in ``plane`` (H x W).  Availability per spec: above
    needs y>0, left needs x>0; DC averages whichever is available,
    128 when neither is."""
    up = plane[y - 1, x:x + size].astype(np.int64) if y > 0 else None
    left = plane[y:y + size, x - 1].astype(np.int64) if x > 0 else None
    if mode == 0:  # Vertical
        if up is None:
            raise ValueError("V pred without above row")
        return np.tile(up, (size, 1))
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("H pred without left column")
        return np.tile(left.reshape(-1, 1), (1, size))
    if mode == 2:  # DC
        if up is not None and left is not None:
            dc = (int(up.sum()) + int(left.sum()) + size) >> \
                (1 + size.bit_length() - 1)
        elif up is not None:
            dc = (int(up.sum()) + size // 2) >> (size.bit_length() - 1)
        elif left is not None:
            dc = (int(left.sum()) + size // 2) >> (size.bit_length() - 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    raise ValueError(f"intra pred mode {mode} not in this subset")


# ------------------------------------------------------------------ #
# Fractional-sample motion compensation (8.4.2.2 — spec-exact taps)    #
# ------------------------------------------------------------------ #

_PAD = 24  # reference-plane edge pad (covers |mv| <= 8 full-pel + taps)


def _tap6(a: np.ndarray, axis: int) -> np.ndarray:
    """6-tap [1,-5,20,20,-5,1] along ``axis``; input must have 5 extra
    samples along that axis.  Output length = input - 5."""
    c = (1, -5, 20, 20, -5, 1)
    n = a.shape[axis] - 5
    sl = [slice(None)] * a.ndim
    out = np.zeros([n if i == axis else s
                    for i, s in enumerate(a.shape)], dtype=np.int64)
    for k, w in enumerate(c):
        sl[axis] = slice(k, k + n)
        out += w * a[tuple(sl)]
    return out


def _mc_luma(ref_pad: np.ndarray, y0: int, x0: int, mv: tuple[int, int],
             bh: int, bw: int) -> np.ndarray:
    """Quarter-pel luma MC for a bh x bw block whose top-left luma
    sample is (y0, x0) in UNPADDED coordinates; ``ref_pad`` is the
    reference plane edge-padded by _PAD.  Spec 8.4.2.2.1: half-pels by
    the 6-tap with (x+16)>>5 (the centre j uses unrounded intermediates
    and (x+512)>>10), quarter-pels by rounding averages."""
    mvy, mvx = mv
    iy, fy = (mvy >> 2), mvy & 3
    ix, fx = (mvx >> 2), mvx & 3
    ty, tx = y0 + iy + _PAD, x0 + ix + _PAD
    if (ty - 2 < 0 or tx - 2 < 0 or ty + bh + 4 > ref_pad.shape[0]
            or tx + bw + 4 > ref_pad.shape[1]):
        raise ValueError("MV beyond the reference pad (subset limit)")
    if fy == 0 and fx == 0:
        return ref_pad[ty:ty + bh, tx:tx + bw].astype(np.int64)
    # integer patch with 6-tap support and one extra row/col for the
    # shifted (+1) full/half positions the quarter averages need
    a = ref_pad[ty - 2:ty + bh + 4, tx - 2:tx + bw + 4].astype(np.int64)
    g = a[2:2 + bh + 1, 2:2 + bw + 1]              # full-pel (+1 grid)
    clip = lambda v: np.clip(v, 0, 255)            # noqa: E731
    bh_ = _tap6(a[2:2 + bh + 1], axis=1)           # horiz halves, (+1,+1)
    b = clip((bh_ + 16) >> 5)
    hv_ = _tap6(a[:, 2:2 + bw + 1], axis=0)        # vert halves
    h = clip((hv_ + 16) >> 5)
    j = None
    if fx == 2 or fy == 2:
        jj = _tap6(_tap6(a, axis=1), axis=0)       # unrounded centre
        j = clip((jj + 512) >> 10)                  # (+1,+1) grid
    s0 = (slice(0, bh), slice(0, bw))
    G = g[s0]
    B = b[s0]
    H = h[s0]
    if (fy, fx) == (0, 2):
        return B
    if (fy, fx) == (2, 0):
        return H
    if (fy, fx) == (2, 2):
        return j[s0]
    Gx = g[0:bh, 1:1 + bw]       # full, col+1
    Gy = g[1:1 + bh, 0:bw]       # full, row+1
    Bd = b[1:1 + bh, 0:bw]       # horiz half, row+1 ("s")
    Hr = h[0:bh, 1:1 + bw]       # vert half, col+1 ("m")
    avg = lambda p, q: (p + q + 1) >> 1            # noqa: E731
    table = {
        (0, 1): avg(G, B), (0, 3): avg(Gx, B),
        (1, 0): avg(G, H), (3, 0): avg(Gy, H),
        (1, 1): avg(B, H), (1, 3): avg(B, Hr),
        (3, 1): avg(Bd, H), (3, 3): avg(Bd, Hr),
        (2, 1): avg(j[s0], H) if j is not None else None,
        (2, 3): avg(j[s0], Hr) if j is not None else None,
        (1, 2): avg(j[s0], B) if j is not None else None,
        (3, 2): avg(j[s0], Bd) if j is not None else None,
    }
    return table[(fy, fx)]


def _mc_chroma(ref_pad: np.ndarray, y0: int, x0: int,
               mv: tuple[int, int], bh: int, bw: int) -> np.ndarray:
    """Eighth-pel bilinear chroma MC (8.4.2.2.2): the luma quarter-pel
    MV applied to the half-resolution plane is eighth-pel there;
    (…+32)>>6 rounding."""
    mvy, mvx = mv
    iy, dy = (mvy >> 3), mvy & 7
    ix, dx = (mvx >> 3), mvx & 7
    ty, tx = y0 + iy + _PAD, x0 + ix + _PAD
    if (ty < 0 or tx < 0 or ty + bh + 1 > ref_pad.shape[0]
            or tx + bw + 1 > ref_pad.shape[1]):
        raise ValueError("MV beyond the reference pad (subset limit)")
    p = ref_pad[ty:ty + bh + 1, tx:tx + bw + 1].astype(np.int64)
    return ((8 - dx) * (8 - dy) * p[:bh, :bw]
            + dx * (8 - dy) * p[:bh, 1:1 + bw]
            + (8 - dx) * dy * p[1:1 + bh, :bw]
            + dx * dy * p[1:1 + bh, 1:1 + bw] + 32) >> 6


def _neighbor_mv(st: "_FrameCoder", by: int, bx: int):
    """(mv, ref) of the 4x4 block at grid (by, bx); ref -1 = intra or
    out of picture (spec: such neighbours contribute mv (0,0))."""
    if by < 0 or bx < 0 or by >= st.mvs.shape[0] or bx >= st.mvs.shape[1]:
        return None
    return ((int(st.mvs[by, bx, 0]), int(st.mvs[by, bx, 1])),
            int(st.refs[by, bx]))


def _mvp_16x16(st: "_FrameCoder", mby: int, mbx: int):
    """Median MV predictor for a 16x16 partition (8.4.1.3) and the
    P_Skip inference MV (8.4.1.1): skip MV is zero when the left or
    above MB is outside the picture or is a zero-MV/ref-0 block."""
    r0, c0 = mby * 4, mbx * 4
    a = _neighbor_mv(st, r0, c0 - 1)
    b = _neighbor_mv(st, r0 - 1, c0)
    c = _neighbor_mv(st, r0 - 1, c0 + 4)
    if c is None:
        c = _neighbor_mv(st, r0 - 1, c0 - 1)      # D fallback
    if b is None and c is None and a is not None:
        mvp = a[0]
    else:
        cands = [a, b, c]
        match = [x for x in cands if x is not None and x[1] == 0]
        if len(match) == 1:
            mvp = match[0][0]
        else:
            vs = [x[0] if x is not None else (0, 0) for x in cands]
            mvp = (int(np.median([v[0] for v in vs])),
                   int(np.median([v[1] for v in vs])))
    skip_zero = (a is None or b is None
                 or (a[1] == 0 and a[0] == (0, 0))
                 or (b[1] == 0 and b[0] == (0, 0)))
    return mvp, ((0, 0) if skip_zero else mvp)


# ------------------------------------------------------------------ #
# CAVLC residual block — spec 9.2 structure, pinned VLCs per header    #
# ------------------------------------------------------------------ #

def _scan_stats(coeffs: list[int]):
    """From a scan-ordered coefficient list -> CAVLC symbols."""
    nz = [i for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    if total == 0:
        return 0, 0, 0, [], [], []
    total_zeros = nz[-1] + 1 - total
    rev = nz[::-1]  # highest frequency first (decode order)
    levels = [coeffs[i] for i in rev]
    t1s = 0
    while t1s < min(3, total) and abs(levels[t1s]) == 1:
        t1s += 1
    signs = [1 if levels[i] < 0 else 0 for i in range(t1s)]
    runs = [rev[i] - rev[i + 1] - 1 for i in range(total - 1)]
    return total, t1s, total_zeros, signs, levels, runs


def _enc_coeff_token(bw: _BitWriter, nc: int, total: int, t1s: int) -> None:
    if nc >= 8:
        bw.u(3 if total == 0 else 4 * (total - 1) + t1s, 6)  # Table 9-5 FLC
    elif nc == -1:
        bw.ue(_PIN_CDC_IDX[(total, t1s)])
    else:
        bw.ue(_PIN_COEFF_IDX[(total, t1s)])


def _dec_coeff_token(br: _BitReader, nc: int) -> tuple[int, int]:
    if nc >= 8:
        code = br.u(6)
        if code == 3:
            return 0, 0
        return code // 4 + 1, code % 4
    if nc == -1:
        idx = br.ue()
        if idx >= len(_PIN_CDC_SYM):
            raise ValueError("bad chroma-DC coeff_token")
        return _PIN_CDC_SYM[idx]
    idx = br.ue()
    if idx >= len(_PIN_COEFF_SYM):
        raise ValueError("bad coeff_token")
    return _PIN_COEFF_SYM[idx]


def _enc_level(bw: _BitWriter, level_code: int, suffix_len: int) -> None:
    """Encode one levelCode against the 9.2.2.1 decoder formula by
    picking the smallest prefix whose window contains it."""
    for prefix in range(0, 48):
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        base = min(15, prefix) << suffix_len
        if prefix >= 15 and suffix_len == 0:
            base += 15
        if prefix >= 16:
            base += (1 << (prefix - 3)) - 4096
        if base <= level_code < base + (1 << size):
            bw.u(0, prefix)
            bw.u(1, 1)
            bw.u(level_code - base, size)
            return
    raise ValueError(f"level_code {level_code} out of range")


def _dec_level(br: _BitReader, suffix_len: int) -> int:
    prefix = 0
    while br.u(1) == 0:
        prefix += 1
        if prefix > 47:
            raise ValueError("level_prefix overflow")
    if prefix == 14 and suffix_len == 0:
        size = 4
    elif prefix >= 15:
        size = prefix - 3
    else:
        size = suffix_len
    code = min(15, prefix) << suffix_len
    if size:
        code += br.u(size)
    if prefix >= 15 and suffix_len == 0:
        code += 15
    if prefix >= 16:
        code += (1 << (prefix - 3)) - 4096
    return code


def _encode_residual(bw: _BitWriter, coeffs: list[int], nc: int,
                     max_coeff: int) -> int:
    """CAVLC-encode one scan-ordered block; returns TotalCoeff."""
    total, t1s, total_zeros, signs, levels, runs = _scan_stats(coeffs)
    _enc_coeff_token(bw, nc, total, t1s)
    if total == 0:
        return 0
    for s in signs:
        bw.u(s, 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        level = levels[i]
        code = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1s and t1s < 3:
            code -= 2
        _enc_level(bw, code, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeff:
        bw.ue(total_zeros)  # PINNED: spec uses Tables 9-7/9-8
    zeros_left = total_zeros
    for i in range(total - 1):
        if zeros_left <= 0:
            break
        bw.ue(runs[i])  # PINNED: spec uses Table 9-10
        zeros_left -= runs[i]
    return total


def _decode_residual(br: _BitReader, nc: int, max_coeff: int
                     ) -> tuple[list[int], int]:
    """Returns (scan-ordered coefficients, TotalCoeff)."""
    total, t1s = _dec_coeff_token(br, nc)
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs, 0
    if total > max_coeff:
        raise ValueError("TotalCoeff > maxNumCoeff")
    levels: list[int] = []
    for _ in range(t1s):
        levels.append(-1 if br.u(1) else 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        code = _dec_level(br, suffix_len)
        if i == t1s and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = br.ue() if total < max_coeff else 0
    if total_zeros > max_coeff - total:
        raise ValueError("total_zeros out of range")
    zeros_left = total_zeros
    runs = []
    for i in range(total - 1):
        if zeros_left > 0:
            run = br.ue()
            if run > zeros_left:
                raise ValueError("run_before > zerosLeft")
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    pos = total_zeros + total - 1
    for i in range(total):
        if pos < 0:
            raise ValueError("CAVLC position underflow")
        coeffs[pos] = levels[i]
        if i < total - 1:
            pos -= 1 + runs[i]
        # the last (lowest-frequency) level lands above the remaining
        # zeros_left zeros automatically
    return coeffs, total


def _nc(grid: np.ndarray, by: int, bx: int) -> int:
    """Neighbour context nC from per-4x4 TotalCoeff grids (9.2.1)."""
    na = int(grid[by, bx - 1]) if bx > 0 else None
    nb = int(grid[by - 1, bx]) if by > 0 else None
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


# ------------------------------------------------------------------ #
# Colour / sampling                                                   #
# ------------------------------------------------------------------ #

def _rgb_to_yuv420(pix: np.ndarray):
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = y.shape
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    to8 = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray
                   ) -> np.ndarray:
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64)
    yf = y.astype(np.float64)
    rgb = np.stack([
        yf + 1.402 * (crf - 128.0),
        yf - 0.344136286 * (cbf - 128.0) - 0.714136286 * (crf - 128.0),
        yf + 1.772 * (cbf - 128.0)], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ #
# Encoder                                                              #
# ------------------------------------------------------------------ #

def _sps_rbsp(w: int, h: int) -> bytes:
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    crop_r = (mbw * 16 - w) // 2
    crop_b = (mbh * 16 - h) // 2
    bw = _BitWriter()
    bw.u(66, 8)           # profile_idc Baseline
    bw.u(0, 8)            # constraint flags + reserved
    bw.u(30, 8)           # level_idc 3.0
    bw.ue(0)              # seq_parameter_set_id
    bw.ue(0)              # log2_max_frame_num_minus4
    bw.ue(2)              # pic_order_cnt_type
    bw.ue(1)              # max_num_ref_frames (P refs the previous pic)
    bw.u(0, 1)            # gaps_in_frame_num_value_allowed
    bw.ue(mbw - 1)
    bw.ue(mbh - 1)
    bw.u(1, 1)            # frame_mbs_only_flag
    bw.u(0, 1)            # direct_8x8_inference_flag
    crop = crop_r or crop_b
    bw.u(1 if crop else 0, 1)
    if crop:
        bw.ue(0)
        bw.ue(crop_r)
        bw.ue(0)
        bw.ue(crop_b)
    bw.u(0, 1)            # vui_parameters_present_flag
    bw.trailing()
    return bw.bytes()


def _pps_rbsp(qp: int) -> bytes:
    bw = _BitWriter()
    bw.ue(0)              # pic_parameter_set_id
    bw.ue(0)              # seq_parameter_set_id
    bw.u(0, 1)            # entropy_coding_mode_flag (CAVLC)
    bw.u(0, 1)            # bottom_field_pic_order_in_frame_present
    bw.ue(0)              # num_slice_groups_minus1
    bw.ue(0)              # num_ref_idx_l0_default_active_minus1
    bw.ue(0)              # num_ref_idx_l1_default_active_minus1
    bw.u(0, 1)            # weighted_pred_flag
    bw.u(0, 2)            # weighted_bipred_idc
    bw.se(qp - 26)        # pic_init_qp_minus26
    bw.se(0)              # pic_init_qs_minus26
    bw.se(0)              # chroma_qp_index_offset
    bw.u(1, 1)            # deblocking_filter_control_present_flag
    bw.u(0, 1)            # constrained_intra_pred_flag
    bw.u(0, 1)            # redundant_pic_cnt_present_flag
    bw.trailing()
    return bw.bytes()


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _best_mode(plane: np.ndarray, src: np.ndarray, y: int, x: int,
               size: int) -> tuple[int, np.ndarray]:
    """Pick V/H/DC by SAD against the source block, availability-aware."""
    best = (None, None, None)
    for mode in ((0,) if y > 0 else ()) + ((1,) if x > 0 else ()) + (2,):
        pred = _pred_block(plane, y, x, size, mode)
        cost = _sad(src[y:y + size, x:x + size], pred)
        if best[0] is None or cost < best[2]:
            best = (mode, pred, cost)
    return best[0], best[1]


class _FrameCoder:
    """Shared per-frame state: reconstruction planes and the per-4x4
    TotalCoeff / intra-mode grids both sides of the codec need."""

    def __init__(self, mbw: int, mbh: int, qp: int) -> None:
        self.mbw, self.mbh, self.qp = mbw, mbh, qp
        self.qpc = _CHROMA_QP[min(51, max(0, qp))]
        self.rec_y = np.zeros((mbh * 16, mbw * 16), dtype=np.uint8)
        self.rec_cb = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
        self.rec_cr = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
        self.tc_y = np.zeros((mbh * 4, mbw * 4), dtype=np.int32)
        self.tc_cb = np.zeros((mbh * 2, mbw * 2), dtype=np.int32)
        self.tc_cr = np.zeros((mbh * 2, mbw * 2), dtype=np.int32)
        # intra 4x4 modes; -1 = not an I_4x4-coded block (spec: treat
        # as DC=2 for prediction-mode prediction)
        self.modes = np.full((mbh * 4, mbw * 4), -1, dtype=np.int32)
        # per-4x4 motion state for P slices: ref -1 = intra/uncoded
        self.mvs = np.zeros((mbh * 4, mbw * 4, 2), dtype=np.int32)
        self.refs = np.full((mbh * 4, mbw * 4), -1, dtype=np.int32)
        # padded reference planes (previous decoded picture), set for P
        self.ref_y = self.ref_cb = self.ref_cr = None

    def set_reference(self, y: np.ndarray, cb: np.ndarray,
                      cr: np.ndarray) -> None:
        self.ref_y = np.pad(y, _PAD, mode="edge")
        self.ref_cb = np.pad(cb, _PAD, mode="edge")
        self.ref_cr = np.pad(cr, _PAD, mode="edge")

    def pred_mode_for(self, by: int, bx: int) -> int:
        ma = int(self.modes[by, bx - 1]) if bx > 0 else -1
        mb = int(self.modes[by - 1, bx]) if by > 0 else -1
        ma = 2 if ma < 0 else ma
        mb = 2 if mb < 0 else mb
        return min(ma, mb)


def _encode_frame(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  qp: int) -> tuple[bytes, np.ndarray, np.ndarray,
                                    np.ndarray]:
    h, w = y.shape
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    # pad to MB multiple by edge replication (cropped back by SPS)
    ypad = np.pad(y, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    cbpad = np.pad(cb, ((0, mbh * 8 - cb.shape[0]),
                        (0, mbw * 8 - cb.shape[1])), mode="edge")
    crpad = np.pad(cr, ((0, mbh * 8 - cr.shape[0]),
                        (0, mbw * 8 - cr.shape[1])), mode="edge")
    st = _FrameCoder(mbw, mbh, qp)
    bw = _BitWriter()
    # slice header (IDR, I slice, whole picture)
    bw.ue(0)              # first_mb_in_slice
    bw.ue(7)              # slice_type I (all slices of picture)
    bw.ue(0)              # pic_parameter_set_id
    bw.u(0, 4)            # frame_num (log2_max_frame_num = 4)
    bw.ue(0)              # idr_pic_id
    bw.u(0, 1)            # no_output_of_prior_pics_flag
    bw.u(0, 1)            # long_term_reference_flag
    bw.se(0)              # slice_qp_delta
    bw.ue(1)              # disable_deblocking_filter_idc = 1 (off)
    for mby in range(mbh):
        for mbx in range(mbw):
            _encode_mb(bw, st, ypad, cbpad, crpad, mby, mbx)
    bw.trailing()
    return bw.bytes(), st


def _encode_mb(bw: _BitWriter, st: _FrameCoder, ysrc: np.ndarray,
               cbsrc: np.ndarray, crsrc: np.ndarray, mby: int,
               mbx: int) -> None:
    oy, ox = mby * 16, mbx * 16
    m16, p16 = _best_mode(st.rec_y, ysrc, oy, ox, 16)
    cost16 = _sad(ysrc[oy:oy + 16, ox:ox + 16], p16)
    # detailed MBs take the per-4x4 path, flat ones the cheap 16x16
    # one — both syntax paths are exercised in any non-trivial frame
    if cost16 > 16 * 16 * 2:
        _encode_mb_i4(bw, st, ysrc, mby, mbx)
    else:
        _encode_mb_i16(bw, st, ysrc, mby, mbx, m16, p16)


def _chroma_residuals(st: _FrameCoder, cbsrc: np.ndarray,
                      crsrc: np.ndarray, mby: int, mbx: int,
                      preds=None):
    """Compute chroma prediction + quantized residuals for one MB
    (intra DC prediction, or the caller's MC predictions via
    ``preds``).  Returns (cbp_chroma, per-component data) WITHOUT
    writing bits or reconstruction — the caller owns syntax order and
    commit."""
    qpc = st.qpc
    out = []
    for comp, (src, rec) in enumerate(((cbsrc, st.rec_cb),
                                       (crsrc, st.rec_cr))):
        oy, ox = mby * 8, mbx * 8
        pred = preds[comp] if preds is not None \
            else _pred_block(rec, oy, ox, 8, 2)  # DC
        resid = src[oy:oy + 8, ox:ox + 8].astype(np.int64) - pred
        wq = np.zeros((2, 2, 4, 4), dtype=np.int64)
        dcs = np.zeros((2, 2), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                wmat = _fdct4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
                dcs[by, bx] = wmat[0, 0]
                wq[by, bx] = _quant4(wmat, qpc)
        # chroma DC: 2x2 Hadamard on raw DCs, quant with doubled f
        h2 = np.array([[1, 1], [1, -1]], dtype=np.int64)
        dct = h2 @ dcs @ h2
        mf00 = int(_MF[qpc % 6][0])
        qbits = 15 + qpc // 6
        f = (1 << qbits) // 3
        dcq = np.sign(dct) * ((np.abs(dct) * mf00 + 2 * f) >> (qbits + 1))
        out.append((pred, wq, dcq.astype(np.int64)))
    has_dc = any((o[2] != 0).any() for o in out)
    has_ac = False
    for _, wq, _dc in out:
        ac = wq.copy()
        ac[:, :, 0, 0] = 0
        if (ac != 0).any():
            has_ac = True
    cbp_c = 2 if has_ac else (1 if has_dc else 0)
    return cbp_c, out


def _commit_chroma(bw: _BitWriter, st: _FrameCoder, cbp_c: int, out,
                   mby: int, mbx: int) -> None:
    """Write chroma residual syntax + reconstruct (both components)."""
    qpc = st.qpc
    for comp, (pred, wq, dcq) in enumerate(out):
        rec = st.rec_cb if comp == 0 else st.rec_cr
        tcg = st.tc_cb if comp == 0 else st.tc_cr
        oy, ox = mby * 8, mbx * 8
        # DC block (nC = -1), raster order of the 4 blocks
        if cbp_c > 0:
            scan = [int(dcq[0, 0]), int(dcq[0, 1]),
                    int(dcq[1, 0]), int(dcq[1, 1])]
            _encode_residual(bw, scan, -1, 4)
            dcd = _chroma_dc_dequant(dcq, qpc)
        else:
            dcd = np.zeros((2, 2), dtype=np.int64)
        blk = np.zeros((8, 8), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                if cbp_c == 2:
                    scan = [int(wq[by, bx][p]) for p in _ZIGZAG[1:]]
                    nc = _nc(tcg, mby * 2 + by, mbx * 2 + bx)
                    tc = _encode_residual(bw, scan, nc, 15)
                    tcg[mby * 2 + by, mbx * 2 + bx] = tc
                    d = _dequant4(wq[by, bx], qpc)
                else:
                    tcg[mby * 2 + by, mbx * 2 + bx] = 0
                    d = np.zeros((4, 4), dtype=np.int64)
                d[0, 0] = dcd[by, bx]
                blk[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = _idct4(d)
        rec[oy:oy + 8, ox:ox + 8] = np.clip(pred + blk, 0, 255)


def _encode_mb_i16(bw: _BitWriter, st: _FrameCoder, ysrc: np.ndarray,
                   mby: int, mbx: int, mode: int, pred: np.ndarray,
                   mb_type_off: int = 0) -> None:
    qp = st.qp
    oy, ox = mby * 16, mbx * 16
    resid = ysrc[oy:oy + 16, ox:ox + 16].astype(np.int64) - pred
    wq = np.zeros((4, 4, 4, 4), dtype=np.int64)
    dcs = np.zeros((4, 4), dtype=np.int64)
    for by in range(4):
        for bx in range(4):
            wmat = _fdct4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
            dcs[by, bx] = wmat[0, 0]
            wq[by, bx] = _quant4(wmat, qp)
    # luma DC: 4x4 Hadamard of raw DCs, (x)>>1 then quant w/ doubled f
    dct = (_HAD @ dcs @ _HAD) >> 1
    mf00 = int(_MF[qp % 6][0])
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    dcq = np.sign(dct) * ((np.abs(dct) * mf00 + 2 * f) >> (qbits + 1))
    cbp_luma15 = 1 if any(
        (wq[by, bx][p] != 0) for by in range(4) for bx in range(4)
        for p in _ZIGZAG[1:]) else 0
    # chroma decision must precede mb_type (CBP chroma is inside it)
    cbsrc, crsrc = st._cbsrc, st._crsrc  # set by encode_h264 wrapper
    cbp_c, chroma = _chroma_residuals(st, cbsrc, crsrc, mby, mbx)
    bw.ue(mb_type_off + 1 + mode + 4 * cbp_c + 12 * cbp_luma15)  # 7-11
    bw.ue(0)  # intra_chroma_pred_mode = DC
    bw.se(0)  # mb_qp_delta
    # Intra16x16DCLevel: 16 coeffs, nC from luma blk (0,0) neighbours
    scan_dc = [int(dcq[p]) for p in _ZIGZAG]
    _encode_residual(bw, scan_dc, _nc(st.tc_y, mby * 4, mbx * 4), 16)
    dcd = _luma_dc_dequant(dcq, qp)
    blk = np.zeros((16, 16), dtype=np.int64)
    for idx in range(16):
        bx4, by4 = _BLK_XY[idx]
        if cbp_luma15:
            scan = [int(wq[by4, bx4][p]) for p in _ZIGZAG[1:]]
            nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
            tc = _encode_residual(bw, scan, nc, 15)
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
            d = _dequant4(wq[by4, bx4], qp)
        else:
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
            d = np.zeros((4, 4), dtype=np.int64)
        d[0, 0] = dcd[by4, bx4]
        blk[by4 * 4:by4 * 4 + 4, bx4 * 4:bx4 * 4 + 4] = _idct4(d)
    st.rec_y[oy:oy + 16, ox:ox + 16] = np.clip(pred + blk, 0, 255)
    st.modes[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = -1
    st.refs[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = -1
    st.mvs[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
    _commit_chroma(bw, st, cbp_c, chroma, mby, mbx)


def _encode_mb_i4(bw: _BitWriter, st: _FrameCoder, ysrc: np.ndarray,
                  mby: int, mbx: int) -> None:
    qp = st.qp
    # First pass: choose modes + residuals IN BLOCK ORDER (prediction
    # uses reconstructed neighbours inside the same MB), buffering the
    # syntax because CBP precedes residuals in the bitstream.
    modes: list[tuple[int, int]] = []  # (flag, payload)
    blocks: list[np.ndarray] = []
    preds: list[np.ndarray] = []
    for idx in range(16):
        bx4, by4 = _BLK_XY[idx]
        gy, gx = mby * 16 + by4 * 4, mbx * 16 + bx4 * 4
        mode, pred = _best_mode(st.rec_y, ysrc, gy, gx, 4)
        pm = st.pred_mode_for(mby * 4 + by4, mbx * 4 + bx4)
        if mode == pm:
            modes.append((1, 0))
        else:
            modes.append((0, mode if mode < pm else mode - 1))
        st.modes[mby * 4 + by4, mbx * 4 + bx4] = mode
        resid = ysrc[gy:gy + 4, gx:gx + 4].astype(np.int64) - pred
        zq = _quant4(_fdct4(resid), qp)
        blocks.append(zq)
        preds.append(pred)
        # provisional reconstruct so the NEXT block predicts from it
        d = _dequant4(zq, qp)
        st.rec_y[gy:gy + 4, gx:gx + 4] = np.clip(pred + _idct4(d), 0, 255)
    cbp_luma = 0
    for q8 in range(4):
        if any((blocks[q8 * 4 + k] != 0).any() for k in range(4)):
            cbp_luma |= 1 << q8
    cbsrc, crsrc = st._cbsrc, st._crsrc
    cbp_c, chroma = _chroma_residuals(st, cbsrc, crsrc, mby, mbx)
    bw.ue(0)  # mb_type I_4x4
    for flag, rem in modes:
        bw.u(flag, 1)
        if not flag:
            bw.u(rem, 3)
    bw.ue(0)  # intra_chroma_pred_mode = DC
    bw.ue(cbp_luma + 16 * cbp_c)  # PINNED identity (spec Table 9-4)
    if cbp_luma or cbp_c:
        bw.se(0)  # mb_qp_delta
    for idx in range(16):
        bx4, by4 = _BLK_XY[idx]
        if cbp_luma & (1 << (2 * (by4 // 2) + (bx4 // 2))):
            scan = [int(blocks[idx][p]) for p in _ZIGZAG]
            nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
            tc = _encode_residual(bw, scan, nc, 16)
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
        else:
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
            if (blocks[idx] != 0).any():
                # CBP says this 8x8 is empty — rebuild recon w/o resid
                gy = mby * 16 + by4 * 4
                gx = mbx * 16 + bx4 * 4
                st.rec_y[gy:gy + 4, gx:gx + 4] = np.clip(
                    preds[idx], 0, 255)
    _commit_chroma(bw, st, cbp_c, chroma, mby, mbx)


def _inter_luma_residual(bw: _BitWriter, st: _FrameCoder, resid,
                         pred, mby: int, mbx: int, qp: int,
                         write_bits: bool):
    """Quantize a 16x16 inter luma residual as 16 standalone 4x4
    blocks (no DC Hadamard — I_16x16-only per spec).  Returns
    (cbp_luma, recon_block); CAVLC-writes when ``write_bits``."""
    zq = []
    for idx in range(16):
        bx4, by4 = _BLK_XY[idx]
        w = _fdct4(resid[by4 * 4:by4 * 4 + 4, bx4 * 4:bx4 * 4 + 4])
        zq.append(_quant4(w, qp))
    cbp_luma = 0
    for q8 in range(4):
        base = q8 * 4
        if any((zq[base + k] != 0).any() for k in range(4)):
            cbp_luma |= 1 << q8
    blk = np.zeros((16, 16), dtype=np.int64)
    for idx in range(16):
        bx4, by4 = _BLK_XY[idx]
        coded = bool(cbp_luma & (1 << (2 * (by4 // 2) + (bx4 // 2))))
        if coded and write_bits:
            scan = [int(zq[idx][p]) for p in _ZIGZAG]
            nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
            tc = _encode_residual(bw, scan, nc, 16)
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
        elif write_bits:
            st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
        if coded:
            d = _dequant4(zq[idx], qp)
            blk[by4 * 4:by4 * 4 + 4, bx4 * 4:bx4 * 4 + 4] = _idct4(d)
    return cbp_luma, np.clip(pred + blk, 0, 255)


def _encode_mb_p(bw: _BitWriter, st: _FrameCoder, ysrc, cbsrc, crsrc,
                 mby: int, mbx: int, skip_run: int) -> int:
    """Encode one P-slice macroblock; returns the updated pending
    mb_skip_run (incremented when this MB becomes P_Skip)."""
    qp = st.qp
    oy, ox = mby * 16, mbx * 16
    src = ysrc[oy:oy + 16, ox:ox + 16].astype(np.int64)
    mvp, skip_mv = _mvp_16x16(st, mby, mbx)

    # full-pel search (±8 around the predictor), then quarter refine;
    # the search centre is clamped so every candidate stays inside the
    # reference pad (the subset's |MV| bound — see _mc_luma)
    base = (int(np.clip(mvp[0] >> 2, -9, 9)),
            int(np.clip(mvp[1] >> 2, -9, 9)))
    best, best_cost = None, None
    for dy in range(-8, 9, 2):
        for dx in range(-8, 9, 2):
            mv = (base[0] + dy, base[1] + dx)
            p = st.ref_y[oy + mv[0] + _PAD:oy + mv[0] + _PAD + 16,
                         ox + mv[1] + _PAD:ox + mv[1] + _PAD + 16]
            cost = _sad(src, p)
            if best_cost is None or cost < best_cost:
                best, best_cost = mv, cost
    best_q = (best[0] * 4, best[1] * 4)
    for step in (2, 1):                      # half then quarter refine
        cur = best_q
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                mv = (cur[0] + dy, cur[1] + dx)
                p = _mc_luma(st.ref_y, oy, ox, mv, 16, 16)
                cost = _sad(src, p)
                if cost < best_cost:
                    best_q, best_cost = mv, cost
    # intra fallback when motion fails (scene cut into this MB)
    m16, p16 = _best_mode(st.rec_y, ysrc, oy, ox, 16)
    if _sad(src, p16) + 64 < best_cost:
        bw.ue(skip_run)
        _encode_mb_i16(bw, st, ysrc, mby, mbx, m16, p16, mb_type_off=5)
        return 0

    # try P_Skip: only valid at the skip MV with an all-zero residual
    # (and only when the inferred MV stays inside the pad bound)
    if (max(abs(skip_mv[0]), abs(skip_mv[1])) <= 4 * (_PAD - 6)
            and best_q == skip_mv):
        pred_sk = _mc_luma(st.ref_y, oy, ox, skip_mv, 16, 16)
        cb_sk = _mc_chroma(st.ref_cb, mby * 8, mbx * 8, skip_mv, 8, 8)
        cr_sk = _mc_chroma(st.ref_cr, mby * 8, mbx * 8, skip_mv, 8, 8)
        cbp_l_sk, recon_sk = _inter_luma_residual(
            bw, st, src - pred_sk, pred_sk, mby, mbx, qp,
            write_bits=False)
        cbp_c_sk, _ = _chroma_residuals(st, cbsrc, crsrc, mby, mbx,
                                        preds=[cb_sk, cr_sk])
    else:
        cbp_l_sk = cbp_c_sk = -1
    if cbp_l_sk == 0 and cbp_c_sk == 0:
        r0, c0 = mby * 4, mbx * 4
        st.rec_y[oy:oy + 16, ox:ox + 16] = recon_sk
        st.rec_cb[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = cb_sk
        st.rec_cr[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = cr_sk
        st.refs[r0:r0 + 4, c0:c0 + 4] = 0
        st.mvs[r0:r0 + 4, c0:c0 + 4] = skip_mv
        st.tc_y[r0:r0 + 4, c0:c0 + 4] = 0
        st.tc_cb[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        st.tc_cr[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        st.modes[r0:r0 + 4, c0:c0 + 4] = -1
        return skip_run + 1

    # P_L0_16x16
    pred = _mc_luma(st.ref_y, oy, ox, best_q, 16, 16)
    cbpred = _mc_chroma(st.ref_cb, mby * 8, mbx * 8, best_q, 8, 8)
    crpred = _mc_chroma(st.ref_cr, mby * 8, mbx * 8, best_q, 8, 8)
    cbp_c, chroma = _chroma_residuals(st, cbsrc, crsrc, mby, mbx,
                                      preds=[cbpred, crpred])
    # dry-run for CBP, then the real bit-writes in syntax order
    cbp_luma, recon = _inter_luma_residual(
        bw, st, src - pred, pred, mby, mbx, qp, write_bits=False)
    bw.ue(skip_run)
    bw.ue(0)                                   # mb_type P_L0_16x16
    bw.se(best_q[1] - mvp[1])                  # mvd_l0 x
    bw.se(best_q[0] - mvp[0])                  # mvd_l0 y
    bw.ue(cbp_luma + 16 * cbp_c)               # PINNED identity map
    if cbp_luma or cbp_c:
        bw.se(0)                               # mb_qp_delta
    _inter_luma_residual(bw, st, src - pred, pred, mby, mbx, qp,
                         write_bits=True)
    # suppress luma blocks CBP says are absent (whole-8x8 zero anyway)
    st.rec_y[oy:oy + 16, ox:ox + 16] = recon
    r0, c0 = mby * 4, mbx * 4
    st.refs[r0:r0 + 4, c0:c0 + 4] = 0
    st.mvs[r0:r0 + 4, c0:c0 + 4] = best_q
    st.modes[r0:r0 + 4, c0:c0 + 4] = -1
    _commit_chroma(bw, st, cbp_c, chroma, mby, mbx)
    return 0


def _encode_frame_p(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                    qp: int, frame_num: int,
                    ref: tuple[np.ndarray, np.ndarray, np.ndarray]):
    h, w = y.shape
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    ypad = np.pad(y, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    st = _FrameCoder(mbw, mbh, qp)
    st.set_reference(*ref)
    bw = _BitWriter()
    bw.ue(0)                  # first_mb_in_slice
    bw.ue(5)                  # slice_type P (all slices of picture)
    bw.ue(0)                  # pic_parameter_set_id
    bw.u(frame_num & 15, 4)   # frame_num
    bw.u(0, 1)                # num_ref_idx_active_override_flag
    bw.u(0, 1)                # ref_pic_list_modification_flag_l0
    bw.u(0, 1)                # adaptive_ref_pic_marking_mode_flag
    bw.se(0)                  # slice_qp_delta
    bw.ue(1)                  # disable_deblocking_filter_idc
    skip_run = 0
    for mby in range(mbh):
        for mbx in range(mbw):
            skip_run = _encode_mb_p(bw, st, ypad, _FrameCoder._cbsrc,
                                    _FrameCoder._crsrc, mby, mbx,
                                    skip_run)
    if skip_run:
        bw.ue(skip_run)       # trailing skip run
    bw.trailing()
    return bw.bytes(), st


def encode_h264(frames: list[np.ndarray], qp: int = 10,
                return_recon: bool = False, inter: bool = False):
    """Encode RGB frames (HxWx3 uint8, even dims) as an Annex B AVC
    byte stream (SPS+PPS up front).  All-intra by default (every frame
    IDR); ``inter=True`` emits IDR + P pictures, each P motion-
    compensated from the previous decoded picture (P_Skip / P_L0_16x16
    / intra-in-P macroblocks, quarter-pel search).  ``return_recon``
    additionally returns the encoder's own reconstructed RGB frames —
    bit-exactly what ``decode_h264`` must produce."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    out = bytearray()
    out += _nal(7, 3, _sps_rbsp(w, h))
    out += _nal(8, 3, _pps_rbsp(qp))
    recons = []
    prev = None                  # (y, cb, cr) recon of previous picture
    for fi, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        if fr.ndim == 2:
            fr = np.stack([fr] * 3, axis=-1)
        y, cb, cr = _rgb_to_yuv420(fr)
        # stash chroma sources where the MB coders can reach them
        # (threading them through every call adds nothing but noise)
        mbw, mbh = (w + 15) // 16, (h + 15) // 16
        cbp = np.pad(cb, ((0, mbh * 8 - cb.shape[0]),
                          (0, mbw * 8 - cb.shape[1])), mode="edge")
        crp = np.pad(cr, ((0, mbh * 8 - cr.shape[0]),
                          (0, mbw * 8 - cr.shape[1])), mode="edge")
        _FrameCoder._cbsrc, _FrameCoder._crsrc = cbp, crp
        if inter and fi > 0:
            rbsp, st = _encode_frame_p(y, cb, cr, qp, fi & 15, prev)
            out += _nal(1, 3, rbsp)
        else:
            rbsp, st = _encode_frame(y, cb, cr, qp)
            out += _nal(5, 3, rbsp)
        # reference = the FULL MB-grid reconstruction (what the decoder
        # holds too); crop only for the returned frames
        prev = (st.rec_y, st.rec_cb, st.rec_cr)
        if return_recon:
            recons.append(_yuv420_to_rgb(
                st.rec_y[:h, :w], st.rec_cb[:h // 2, :w // 2],
                st.rec_cr[:h // 2, :w // 2]))
    return (bytes(out), recons) if return_recon else bytes(out)


# ------------------------------------------------------------------ #
# Decoder                                                              #
# ------------------------------------------------------------------ #

class _SPS:
    pass


def _parse_sps(rbsp: bytes) -> _SPS:
    br = _BitReader(rbsp)
    sps = _SPS()
    profile = br.u(8)
    br.u(8)  # constraint flags
    br.u(8)  # level
    br.ue()  # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ValueError("High-profile SPS extensions not in this subset")
    sps.log2_max_frame_num = br.ue() + 4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()
    elif poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 not in this subset")
    br.ue()  # max_num_ref_frames
    br.u(1)
    mbw = br.ue() + 1
    mbh = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise ValueError("interlaced not in this subset")
    br.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    sps.mbw, sps.mbh = mbw, mbh
    sps.w = mbw * 16 - 2 * (crop_l + crop_r)
    sps.h = mbh * 16 - 2 * (crop_t + crop_b)
    sps.crop = (crop_t * 2, crop_l * 2)
    return sps


class _PPS:
    pass


def _parse_pps(rbsp: bytes) -> _PPS:
    br = _BitReader(rbsp)
    pps = _PPS()
    br.ue()
    br.ue()
    if br.u(1):
        raise ValueError("CABAC not in this subset")
    br.u(1)
    if br.ue() != 0:
        raise ValueError("slice groups not in this subset")
    br.ue()
    br.ue()
    br.u(1)
    br.u(2)
    pps.init_qp = br.se() + 26
    br.se()
    pps.chroma_qp_off = br.se()
    pps.deblock_ctrl = br.u(1)
    br.u(1)
    br.u(1)
    return pps


def _decode_mb_pskip(st: _FrameCoder, mby: int, mbx: int) -> None:
    """P_Skip: motion-inferred copy from the reference, no residual."""
    _, skip_mv = _mvp_16x16(st, mby, mbx)
    oy, ox = mby * 16, mbx * 16
    st.rec_y[oy:oy + 16, ox:ox + 16] = np.clip(
        _mc_luma(st.ref_y, oy, ox, skip_mv, 16, 16), 0, 255)
    st.rec_cb[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = np.clip(
        _mc_chroma(st.ref_cb, mby * 8, mbx * 8, skip_mv, 8, 8), 0, 255)
    st.rec_cr[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = np.clip(
        _mc_chroma(st.ref_cr, mby * 8, mbx * 8, skip_mv, 8, 8), 0, 255)
    r0, c0 = mby * 4, mbx * 4
    st.refs[r0:r0 + 4, c0:c0 + 4] = 0
    st.mvs[r0:r0 + 4, c0:c0 + 4] = skip_mv
    st.tc_y[r0:r0 + 4, c0:c0 + 4] = 0
    st.tc_cb[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
    st.tc_cr[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
    st.modes[r0:r0 + 4, c0:c0 + 4] = -1


def _decode_mb(br: _BitReader, st: _FrameCoder, qp: int, mby: int,
               mbx: int, is_p: bool = False) -> int:
    """Decode one (non-skip) macroblock; returns the possibly
    delta'd QP."""
    mb_type = br.ue()
    oy, ox = mby * 16, mbx * 16
    if is_p and mb_type < 5:  # ---- inter ---------------------------
        if mb_type != 0:
            raise ValueError("sub-16x16 inter partitions not in subset")
        mvd_x = br.se()
        mvd_y = br.se()
        mvp, _ = _mvp_16x16(st, mby, mbx)
        mv = (mvp[0] + mvd_y, mvp[1] + mvd_x)
        pred = _mc_luma(st.ref_y, oy, ox, mv, 16, 16)
        cbp = br.ue()
        if cbp > 47:
            raise ValueError("coded_block_pattern out of range")
        cbp_luma, cbp_c = cbp & 15, cbp >> 4
        if cbp:
            qp = (qp + br.se()) % 52
        blk = np.zeros((16, 16), dtype=np.int64)
        for idx in range(16):
            bx4, by4 = _BLK_XY[idx]
            if cbp_luma & (1 << (2 * (by4 // 2) + (bx4 // 2))):
                nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
                scan, tc = _decode_residual(br, nc, 16)
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
                z = np.zeros((4, 4), dtype=np.int64)
                for k, p in enumerate(_ZIGZAG):
                    z[p] = scan[k]
                blk[by4 * 4:by4 * 4 + 4, bx4 * 4:bx4 * 4 + 4] = \
                    _idct4(_dequant4(z, qp))
            else:
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
        st.rec_y[oy:oy + 16, ox:ox + 16] = np.clip(pred + blk, 0, 255)
        r0, c0 = mby * 4, mbx * 4
        st.refs[r0:r0 + 4, c0:c0 + 4] = 0
        st.mvs[r0:r0 + 4, c0:c0 + 4] = mv
        st.modes[r0:r0 + 4, c0:c0 + 4] = -1
        _decode_chroma(br, st, qp, mby, mbx, cbp_c, preds=[
            _mc_chroma(st.ref_cb, mby * 8, mbx * 8, mv, 8, 8),
            _mc_chroma(st.ref_cr, mby * 8, mbx * 8, mv, 8, 8)])
        return qp
    if is_p:
        mb_type -= 5          # P-slice intra offset (Table 7-10)
    if mb_type == 25:
        raise ValueError("I_PCM not in this subset")
    if mb_type > 25:
        raise ValueError(f"mb_type {mb_type} not an I macroblock")
    if mb_type == 0:  # ---- I_4x4 -----------------------------------
        modes = []
        for idx in range(16):
            bx4, by4 = _BLK_XY[idx]
            pm = st.pred_mode_for(mby * 4 + by4, mbx * 4 + bx4)
            if br.u(1):
                mode = pm
            else:
                rem = br.u(3)
                mode = rem if rem < pm else rem + 1
            if mode > 2:
                raise ValueError(f"intra4x4 mode {mode} not in subset")
            modes.append(mode)
            st.modes[mby * 4 + by4, mbx * 4 + bx4] = mode
        chroma_mode = br.ue()
        if chroma_mode > 2:
            raise ValueError("chroma plane pred not in subset")
        cbp = br.ue()  # PINNED identity mapping
        if cbp > 47:
            raise ValueError("coded_block_pattern out of range")
        cbp_luma, cbp_c = cbp & 15, cbp >> 4
        if cbp:
            qp = (qp + br.se()) % 52
        for idx in range(16):
            bx4, by4 = _BLK_XY[idx]
            gy, gx = oy + by4 * 4, ox + bx4 * 4
            pred = _pred_block(st.rec_y, gy, gx, 4, modes[idx])
            if cbp_luma & (1 << (2 * (by4 // 2) + (bx4 // 2))):
                nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
                scan, tc = _decode_residual(br, nc, 16)
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
                z = np.zeros((4, 4), dtype=np.int64)
                for k, p in enumerate(_ZIGZAG):
                    z[p] = scan[k]
                blk = _idct4(_dequant4(z, qp))
            else:
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
                blk = 0
            st.rec_y[gy:gy + 4, gx:gx + 4] = np.clip(pred + blk, 0, 255)
    else:  # ---- I_16x16 ---------------------------------------------
        t = mb_type - 1
        mode16, cbp_c, cbp_luma15 = t % 4, (t // 4) % 3, t // 12
        if mode16 > 2:
            raise ValueError("plane 16x16 pred not in subset")
        chroma_mode = br.ue()
        if chroma_mode > 2:
            raise ValueError("chroma plane pred not in subset")
        qp = (qp + br.se()) % 52
        pred = _pred_block(st.rec_y, oy, ox, 16, mode16)
        scan_dc, _ = _decode_residual(
            br, _nc(st.tc_y, mby * 4, mbx * 4), 16)
        dcq = np.zeros((4, 4), dtype=np.int64)
        for k, p in enumerate(_ZIGZAG):
            dcq[p] = scan_dc[k]
        dcd = _luma_dc_dequant(dcq, qp)
        blk = np.zeros((16, 16), dtype=np.int64)
        for idx in range(16):
            bx4, by4 = _BLK_XY[idx]
            if cbp_luma15:
                nc = _nc(st.tc_y, mby * 4 + by4, mbx * 4 + bx4)
                scan, tc = _decode_residual(br, nc, 15)
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = tc
                z = np.zeros((4, 4), dtype=np.int64)
                for k, p in enumerate(_ZIGZAG[1:]):
                    z[p] = scan[k]
                d = _dequant4(z, qp, skip_dc=True)
            else:
                st.tc_y[mby * 4 + by4, mbx * 4 + bx4] = 0
                d = np.zeros((4, 4), dtype=np.int64)
            d[0, 0] = dcd[by4, bx4]
            blk[by4 * 4:by4 * 4 + 4, bx4 * 4:bx4 * 4 + 4] = _idct4(d)
        st.rec_y[oy:oy + 16, ox:ox + 16] = np.clip(pred + blk, 0, 255)
        st.modes[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = -1
    # ---- chroma ----------------------------------------------------
    # intra_chroma_pred_mode numbering (8.3.4): 0=DC, 1=H, 2=V —
    # remap onto the shared predictor's 0=V/1=H/2=DC convention
    _decode_chroma(br, st, qp, mby, mbx, cbp_c,
                   cmode={0: 2, 1: 1, 2: 0}[chroma_mode])
    return qp


def _decode_chroma(br: _BitReader, st: _FrameCoder, qp: int, mby: int,
                   mbx: int, cbp_c: int, preds=None,
                   cmode: int = 2) -> None:
    """Chroma residual decode shared by intra (``cmode`` prediction)
    and inter (``preds`` = the two MC blocks) macroblocks."""
    qpc = _CHROMA_QP[min(51, max(0, qp))]
    for comp in range(2):
        rec = st.rec_cb if comp == 0 else st.rec_cr
        tcg = st.tc_cb if comp == 0 else st.tc_cr
        cy, cx = mby * 8, mbx * 8
        pred = preds[comp] if preds is not None \
            else _pred_block(rec, cy, cx, 8, cmode)
        if cbp_c > 0:
            scan, _ = _decode_residual(br, -1, 4)
            dcq = np.array([[scan[0], scan[1]], [scan[2], scan[3]]],
                           dtype=np.int64)
            dcd = _chroma_dc_dequant(dcq, qpc)
        else:
            dcd = np.zeros((2, 2), dtype=np.int64)
        blk = np.zeros((8, 8), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                if cbp_c == 2:
                    nc = _nc(tcg, mby * 2 + by, mbx * 2 + bx)
                    scan, tc = _decode_residual(br, nc, 15)
                    tcg[mby * 2 + by, mbx * 2 + bx] = tc
                    z = np.zeros((4, 4), dtype=np.int64)
                    for k, p in enumerate(_ZIGZAG[1:]):
                        z[p] = scan[k]
                    d = _dequant4(z, qpc, skip_dc=True)
                else:
                    tcg[mby * 2 + by, mbx * 2 + bx] = 0
                    d = np.zeros((4, 4), dtype=np.int64)
                d[0, 0] = dcd[by, bx]
                blk[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = _idct4(d)
        rec[cy:cy + 8, cx:cx + 8] = np.clip(pred + blk, 0, 255)


def decode_h264_yuv(data: bytes):
    """Annex B -> list of (y, cb, cr) uint8 planes (cropped)."""
    sps = pps = None
    frames = []
    prev_rec = None           # full-grid planes of the previous picture
    for nal_type, rbsp in split_nals(data):
        if nal_type == 7:
            sps = _parse_sps(rbsp)
        elif nal_type == 8:
            pps = _parse_pps(rbsp)
        elif nal_type in (1, 5):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            br = _BitReader(rbsp)
            if br.ue() != 0:
                raise ValueError("multi-slice pictures not in subset")
            slice_type = br.ue() % 5
            if slice_type not in (0, 2):
                raise ValueError("only I/P slices in this subset")
            is_p = slice_type == 0
            if is_p and nal_type == 5:
                raise ValueError("IDR picture cannot carry a P slice")
            br.ue()  # pps id
            br.u(sps.log2_max_frame_num)  # frame_num
            if nal_type == 5:
                br.ue()  # idr_pic_id
            if is_p:
                if br.u(1):  # num_ref_idx_active_override_flag
                    if br.ue() != 0:
                        raise ValueError("multi-reference not in subset")
                if br.u(1):  # ref_pic_list_modification_flag_l0
                    raise ValueError(
                        "reference list modification not in subset")
            if nal_type == 5:
                br.u(1)  # no_output_of_prior_pics
                br.u(1)  # long_term_reference
            elif br.u(1):    # adaptive_ref_pic_marking_mode_flag
                raise ValueError("adaptive ref marking not in subset")
            qp = pps.init_qp + br.se()
            if pps.deblock_ctrl:
                if br.ue() == 0:  # disable_deblocking_filter_idc
                    raise ValueError(
                        "in-loop deblocking not in this subset")
                # idc==1: filter off, nothing follows; idc==2 would
                # carry alpha/beta offsets
            st = _FrameCoder(sps.mbw, sps.mbh, qp)
            if is_p:
                if prev_rec is None:
                    raise ValueError("P picture without a reference")
                st.set_reference(*prev_rec)
                total = sps.mbw * sps.mbh
                idx = 0
                while idx < total:
                    run = br.ue()
                    if idx + run > total:
                        raise ValueError("mb_skip_run overruns slice")
                    for _ in range(run):
                        mby, mbx = divmod(idx, sps.mbw)
                        _decode_mb_pskip(st, mby, mbx)
                        idx += 1
                    if idx < total:
                        mby, mbx = divmod(idx, sps.mbw)
                        qp = _decode_mb(br, st, qp, mby, mbx, is_p=True)
                        idx += 1
            else:
                for mby in range(sps.mbh):
                    for mbx in range(sps.mbw):
                        qp = _decode_mb(br, st, qp, mby, mbx)
            prev_rec = (st.rec_y, st.rec_cb, st.rec_cr)
            t, l = sps.crop
            frames.append((st.rec_y[t:t + sps.h, l:l + sps.w],
                           st.rec_cb[t // 2:(t + sps.h) // 2,
                                     l // 2:(l + sps.w) // 2],
                           st.rec_cr[t // 2:(t + sps.h) // 2,
                                     l // 2:(l + sps.w) // 2]))
        elif nal_type not in (6, 9, 10, 11, 12):
            raise ValueError(f"NAL type {nal_type} not in this subset")
        # other NAL types (SEI, AUD...) are skippable
    if not frames:
        raise ValueError("no coded pictures")
    return frames


def decode_h264(data: bytes) -> list[np.ndarray]:
    """Annex B AVC intra stream -> list of HxWx3 RGB uint8 frames."""
    return [_yuv420_to_rgb(y, cb, cr) for y, cb, cr in
            decode_h264_yuv(data)]
