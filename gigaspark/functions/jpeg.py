"""Pure-numpy baseline JPEG (JFIF) encoder/decoder.

Unstubs the ``jpg`` branch of the multimodal layer (SURVEY §2.8 C8,
``Images.cpp`` handles real web formats [U][M]) without PIL/libjpeg —
neither exists in this sandbox (SURVEY §7.4.3).  Written from the public
ITU-T T.81 spec; quantization and Huffman tables are the spec's own
Annex K examples (the universal "standard tables").

Subset (encoder emits exactly this; decoder accepts exactly this and
rejects the rest with ValueError rather than mis-decoding):

  * baseline sequential DCT (SOF0), 8-bit, 3 components, YCbCr (JFIF)
  * 4:4:4 (no chroma subsampling — keeps the PSNR≥40dB invariant honest
    on noise fixtures and the MCU loop simple)
  * one interleaved scan, no restart markers, no progressive/arithmetic

All pixel/DCT/quant math is whole-array numpy; only the entropy coder
walks symbols in Python (bounded: one iteration per nonzero coefficient,
fixtures are ≤128×128).
"""

from __future__ import annotations

import re
import struct

import numpy as np

# a 0xFF followed by anything but the 0x00 stuffing byte inside a scan is
# a marker (we reject RSTs at DRI-parse time, so none are legal here)
_UNSTUFF_RE = re.compile(rb"\xff[^\x00]", re.DOTALL)

# --- Annex K example tables (the de-facto standard tables) -------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# (bits[1..16], values) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II basis; block DCT = C @ X @ C.T
_k = np.arange(8)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_C[0, :] *= 1 / np.sqrt(2)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 C.2."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_decode(bits, values):
    """(bits, values) → {(length, code): symbol}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad to multiples of 8 and return (n_blocks, 8, 8) row-major."""
    h, w = chan.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(chan, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


class _BitWriter:
    """Packs (code, length) symbol pairs; byte-stuffs 0xFF per spec.

    ``write_pairs`` keeps the accumulator in locals — the entropy coder
    emits ~2 symbols per nonzero coefficient, so call/attribute overhead
    here dominates encode time if written naively.
    """

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_pairs(self, pairs: list[tuple[int, int]]) -> None:
        acc, nbits, buf = self.acc, self.nbits, self.buf
        for code, length in pairs:
            acc = ((acc << length) | (code & ((1 << length) - 1)))
            nbits += length
            while nbits >= 8:
                nbits -= 8
                byte = (acc >> nbits) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)  # byte stuffing
            acc &= (1 << nbits) - 1
        self.acc, self.nbits = acc, nbits

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write_pairs([((1 << pad) - 1, pad)])  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(writer, vec, dc_codes, ac_codes, pred):
    """Huffman-encode one quantized block (zigzag coeff vector)."""
    pairs = []
    dc = int(vec[0])
    size, bits = _magnitude(dc - pred)
    pairs.append(dc_codes[size])
    if size:
        pairs.append((bits, size))
    nz = np.nonzero(vec[1:])[0]
    vals = vec[1:][nz]
    last = -1
    for idx, val in zip(nz.tolist(), vals.tolist()):
        run = idx - last - 1
        last = idx
        while run > 15:
            pairs.append(ac_codes[0xF0])  # ZRL
            run -= 16
        size, bits = _magnitude(val)
        pairs.append(ac_codes[(run << 4) | size])
        pairs.append((bits, size))
    if last < 62:
        pairs.append(ac_codes[0x00])  # EOB
    writer.write_pairs(pairs)
    return dc


def encode_jpeg(pix: np.ndarray, quality: int = 95) -> bytes:
    """RGB uint8 (h, w, 3) → baseline JFIF bytes (4:4:4, Annex K tables)."""
    h, w, _ = pix.shape
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(pix)

    comp_vecs = []
    for ci in range(3):
        blocks, _, _ = _blockify(ycc[..., ci] - 128.0)
        coef = _DCT_C @ blocks @ _DCT_C.T
        q = qy if ci == 0 else qc
        quant = np.round(coef / q[None, :, :]).astype(np.int32)
        comp_vecs.append(quant.reshape(-1, 64)[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(q.reshape(64)[ZIGZAG].astype(np.uint8).tolist())
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)  # 1x1 sampling
    for tc_th, (bits, values) in ((0x00, DC_LUMA), (0x01, DC_CHROMA),
                                  (0x10, AC_LUMA), (0x11, AC_CHROMA)):
        body = bytes([tc_th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tables)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    dc_y, ac_y = _build_codes(*DC_LUMA), _build_codes(*AC_LUMA)
    dc_c, ac_c = _build_codes(*DC_CHROMA), _build_codes(*AC_CHROMA)
    writer = _BitWriter()
    preds = [0, 0, 0]
    n_blocks = comp_vecs[0].shape[0]
    for b in range(n_blocks):  # interleaved MCU = 1 block per component
        for ci in range(3):
            dc_t, ac_t = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_block(
                writer, comp_vecs[ci][b], dc_t, ac_t, preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Reads the entropy-coded scan as a pre-unpacked bit list.

    The scan is unstuffed once (0xFF00 → 0xFF; any other 0xFF byte in a
    baseline no-RST scan is a framing error) and exploded to a Python
    list of 0/1 via numpy — ~5× faster than per-bit byte accounting.
    """

    def __init__(self, data: bytes):
        bad = _UNSTUFF_RE.search(data)
        if bad is not None:
            raise ValueError(
                f"unexpected marker 0xFF{data[bad.start() + 1]:02X} in scan")
        unstuffed = data.replace(b"\xff\x00", b"\xff")
        self.bits = np.unpackbits(
            np.frombuffer(unstuffed, dtype=np.uint8)).tolist()
        self.pos = 0

    def read_bits(self, n: int) -> int:
        bits, p = self.bits, self.pos
        if p + n > len(bits):
            raise ValueError("truncated jpeg scan")
        v = 0
        for i in range(n):
            v = (v << 1) | bits[p + i]
        self.pos = p + n
        return v

    def read_symbol(self, table: dict) -> int:
        bits, p = self.bits, self.pos
        code, length, end = 0, 0, len(bits)
        while length < 16 and p < end:
            code = (code << 1) | bits[p]
            p += 1
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = p
                return sym
        raise ValueError("invalid huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → RGB uint8 (h, w, 3). Subset per module doc."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:  # truncated/corrupt container
        raise ValueError(f"jpeg: truncated/corrupt ({e})") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a jpeg (no SOI)")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    sof = None
    scan_comps = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i:i + 2])
        body = data[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.frombuffer(body[j + 1:j + 65], dtype=np.uint8).astype(np.int32)
                qtables[tq] = q[UNZIGZAG].reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                tc_th = body[j]
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                values = list(body[j + 17:j + 17 + n])
                htables[tc_th] = _build_decode(bits, values)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if depth != 8 or nc != 3:
                raise ValueError("unsupported jpeg (need 8-bit, 3 components)")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("unsupported jpeg subset (need 4:4:4)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported jpeg coding process (baseline only)")
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart markers unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * c], body[2 + 2 * c]) for c in range(ns)]
            scan_start = i
            # scan runs until next non-stuffed, non-RST marker
            j = i
            while j < len(data) - 1:
                if data[j] == 0xFF and data[j + 1] not in (0x00,) and not (0xD0 <= data[j + 1] <= 0xD7):
                    break
                j += 1
            scan_bytes = data[scan_start:j]
            i = j
        # APPn/COM and anything else: skipped via seglen

    if sof is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    bh, bw = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw

    reader = _BitReader(scan_bytes)
    preds = [0, 0, 0]
    coefs = [np.zeros((n_blocks, 64), dtype=np.int32) for _ in range(3)]
    tabs = []
    for (cid, tq), (scid, tables) in zip(comps, scan_comps):
        if cid != scid:
            raise ValueError("scan/frame component order mismatch")
        dc_t = htables.get(tables >> 4)
        ac_t = htables.get(0x10 | (tables & 0x0F))
        if dc_t is None or ac_t is None or tq not in qtables:
            raise ValueError("missing huffman/quant table")
        tabs.append((dc_t, ac_t, qtables[tq]))

    for b in range(n_blocks):
        for ci in range(3):
            dc_t, ac_t, _ = tabs[ci]
            vec = coefs[ci][b]
            size = reader.read_symbol(dc_t)
            diff = _extend(reader.read_bits(size), size)
            preds[ci] += diff
            vec[0] = preds[ci]
            k = 1
            while k < 64:
                rs = reader.read_symbol(ac_t)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overflow")
                vec[k] = _extend(reader.read_bits(size), size)
                k += 1

    chans = []
    for ci in range(3):
        _, _, q = tabs[ci]
        blocks = coefs[ci][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        blocks *= q[None, :, :]
        spat = _DCT_C.T @ blocks @ _DCT_C + 128.0
        grid = spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        chans.append(grid[:h, :w])
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))
