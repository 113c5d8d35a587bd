"""Pure-numpy GIF (87a/89a) encoder/decoder.

Unstubs the ``gif`` branch of the multimodal layer (SURVEY §2.8 C8 —
``Images.cpp`` handles the real web formats [U][M]; gif was one of the
two remaining sandbox stubs).  Written from the public GIF89a
specification (CompuServe, 1990) — no PIL/giflib in this container
(SURVEY §7.4.3).

Subset (encoder emits exactly this; decoder accepts standard files and
rejects what it can't represent with ValueError rather than
mis-decoding):

  * decoder: GIF87a/GIF89a, global or local color table, one image
    frame (the first — web thumbnails; later frames are ignored),
    non-interlaced or interlaced, any LZW minimum code size; Graphic
    Control / Comment / Application / Plain Text extension blocks are
    skipped per spec.  Transparency index (GCE) renders as the palette
    color (no alpha channel in the pixel contract).
  * encoder: GIF87a, global color table only, single non-interlaced
    frame.  GIF is palette-indexed, so the encoder requires the image
    to use ≤256 distinct RGB colors (fixture images are quantized
    first — see :func:`palette_quantize`); it is then LOSSLESS.

LZW: the per-symbol loop is plain Python over the *code stream* (one
iteration per emitted code, not per pixel-bit); bit packing/unpacking
is vectorized numpy.  Fixtures are ≤128×128 so this stays well under a
millisecond per image; at cluster scale each decode rides inside the
Arrow-batched ``mapInPandas`` in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------- #
# bit-stream helpers                                                          #
# --------------------------------------------------------------------------- #

class _BitReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    __slots__ = ("buf", "pos", "acc", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.buf):
                return -1  # truncated stream
            self.acc |= self.buf[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# --------------------------------------------------------------------------- #
# LZW                                                                         #
# --------------------------------------------------------------------------- #

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of length n_pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    # dictionary: list of byte strings; entries < clear are literals
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == -1 or code == eoi:
            break
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]  # clear/eoi slots are unreachable here
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("gif: truncated LZW stream")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array → GIF-variant LZW bytes (with Clear/EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = clear + 2
    w.write(clear, width)
    run = b""
    for px in indices.tobytes():
        cand = run + bytes((px,))
        if cand in table:
            run = cand
            continue
        w.write(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            w.write(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            width = min_code_size + 1
            next_code = clear + 2
        run = bytes((px,))
    if run:
        w.write(table[run], width)
    w.write(eoi, width)
    return w.flush()


# --------------------------------------------------------------------------- #
# container                                                                   #
# --------------------------------------------------------------------------- #

_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF → (h, w, 3) uint8 RGB."""
    try:
        return _decode_gif(data)
    except (struct.error, IndexError) as e:  # truncated container
        raise ValueError(f"gif: truncated/corrupt ({e})") from e


def _decode_gif(data: bytes) -> np.ndarray:
    if len(data) < 13 or data[:6] not in _GIF_SIGS:
        raise ValueError("not gif")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        # image descriptor
        _ix, _iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code_size, iw * ih)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("gif: index outside color table")
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty(ih, dtype=np.int64)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                for y in range(start, ih, step):
                    rows[y] = src  # display row y came src-th in the stream
                    src += 1
            idx = idx.reshape(ih, iw)[rows]
        else:
            idx = idx.reshape(ih, iw)
        return ct[idx]
    raise ValueError("gif: no image frame")


def palette_quantize(pix: np.ndarray) -> np.ndarray:
    """3-3-2 RGB quantization (256 colors) — makes any image GIF-encodable
    deterministically.  PSNR ≈ 32 dB on noise; fixture generators that
    need the ≥40 dB invariant pre-quantize so the round trip is lossless."""
    p = pix.astype(np.uint16)
    r = (p[..., 0] >> 5) << 5
    g = (p[..., 1] >> 5) << 5
    b = (p[..., 2] >> 6) << 6
    return np.stack([(r + 16).clip(0, 255), (g + 16).clip(0, 255),
                     (b + 32).clip(0, 255)], axis=-1).astype(np.uint8)


def encode_gif(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → GIF87a bytes (lossless)."""
    h, w, _ = pix.shape
    flat = pix.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"gif: {len(colors)} colors > 256 — quantize first "
            "(palette_quantize)")
    # color-table size must be a power of two ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    min_code_size = max(2, bits)
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    lzw = _lzw_encode(inverse.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
