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
    """First frame of a GIF → (h, w, 3) uint8 RGB (full logical-screen
    canvas; a sub-rectangle first frame composes over the background)."""
    return decode_gif_frames(data, max_frames=1)[0]


def decode_gif_frames(data: bytes, max_frames: int | None = None
                      ) -> list[np.ndarray]:
    """ALL frames of a (possibly animated) GIF, composed per the GIF89a
    animation model: each frame renders its (ix, iy, iw, ih)
    sub-rectangle onto the logical-screen canvas; Graphic Control
    transparency leaves underlying canvas pixels; disposal methods
    0/1 (leave), 2 (restore to background color), 3 (restore to
    previous canvas) prepare the canvas for the next frame.  Returns
    full-canvas RGB snapshots, one per frame."""
    try:
        return _decode_gif_frames(data, max_frames)
    except (struct.error, IndexError) as e:  # truncated container
        raise ValueError(f"gif: truncated/corrupt ({e})") from e


def _decode_gif_frames(data: bytes, max_frames: int | None
                       ) -> list[np.ndarray]:
    if len(data) < 13 or data[:6] not in _GIF_SIGS:
        raise ValueError("not gif")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bgcolor = (gct[bg] if gct is not None and bg < len(gct)
               else np.array([255, 255, 255], dtype=np.uint8))
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bgcolor
    frames: list[np.ndarray] = []
    gce: tuple[int, int | None] | None = None   # (disposal, transparent idx)
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos + 1 < len(data) and data[pos + 1] == 0xF9 \
                    and pos + 7 <= len(data) and data[pos + 2] >= 4:
                packed, _delay, tidx = struct.unpack(
                    "<BHB", data[pos + 3:pos + 7])
                gce = ((packed >> 2) & 0x07, tidx if packed & 1 else None)
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        if ix + iw > sw or iy + ih > sh or iw == 0 or ih == 0:
            raise ValueError("gif: frame rect outside logical screen")
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
        disposal, tidx = gce or (0, None)
        gce = None
        saved = canvas.copy() if disposal == 3 else None
        rgb = ct[idx]
        region = canvas[iy:iy + ih, ix:ix + iw]
        if tidx is not None:
            mask = idx != tidx
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[iy:iy + ih, ix:ix + iw] = bgcolor
        elif disposal == 3:
            canvas = saved
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("gif: no image frame")
    return frames


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


def _emit_lzw(out: bytearray, indices: np.ndarray,
              min_code_size: int) -> None:
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)


def encode_gif_anim(frames: list[np.ndarray], delay_cs: int = 10,
                    optimize_rects: bool = False, loop: int = 0) -> bytes:
    """Full-canvas RGB frames → animated GIF89a (lossless).

    One global palette over the union of frame colors (<=255 so a
    transparent slot fits); NETSCAPE2.0 loop extension; per-frame
    Graphic Control (disposal 1 = leave in place).  With
    optimize_rects, each frame after the first encodes only the
    bounding box of changed pixels, and unchanged pixels INSIDE that
    box use the reserved transparent index — the standard animation
    delta encoding, exercising the decoder's sub-rectangle +
    transparency composition."""
    if not frames:
        raise ValueError("gif: no frames")
    h, w, _ = frames[0].shape
    allpix = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(allpix, axis=0, return_inverse=True)
    if len(colors) > 255:
        raise ValueError(f"gif: {len(colors)} colors > 255 — quantize first")
    tidx = len(colors)                 # reserved transparent slot
    bits = max(1, int(np.ceil(np.log2(max(tidx + 1, 2)))))
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    min_code_size = max(2, bits)
    per_frame = [inv[i * h * w:(i + 1) * h * w].reshape(h, w).astype(np.uint8)
                 for i in range(len(frames))]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += (b"\x21\xFF\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop) + b"\x00")
    prev = None
    for fi, idx in enumerate(per_frame):
        use_rect = optimize_rects and prev is not None
        if use_rect:
            diff = idx != prev
            if diff.any():
                ys, xs = np.nonzero(diff)
                iy, ix = int(ys.min()), int(xs.min())
                ih, iw = int(ys.max()) - iy + 1, int(xs.max()) - ix + 1
            else:
                iy = ix = 0
                ih = iw = 1
            sub = idx[iy:iy + ih, ix:ix + iw].copy()
            sub[~diff[iy:iy + ih, ix:ix + iw]] = tidx
            transparent = True
        else:
            iy = ix = 0
            ih, iw = h, w
            sub = idx
            transparent = False
        packed = (1 << 2) | (1 if transparent else 0)   # disposal 1
        out += b"\x21\xF9\x04" + struct.pack(
            "<BHB", packed, delay_cs, tidx if transparent else 0) + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", ix, iy, iw, ih, 0)
        _emit_lzw(out, sub.reshape(-1), min_code_size)
        prev = idx
    out += b"\x3B"
    return bytes(out)


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
