"""Pure-python WebP LOSSLESS (VP8L) codec — subset.

Public spec: "WebP Lossless Bitstream Specification" (Google, RFC-style
doc shipped with libwebp).  Container: RIFF('WEBP') with a 'VP8L'
chunk.  This closes the last image-format stub in the multimodal axis
(SURVEY §2.8 C8): web crawls carry .webp, and the pipeline can now
decode the lossless flavor without libwebp.

REAL and tested here:
  * bit-reader (LSB-first), canonical-Huffman building and decoding,
    including the code-length code with RLE symbols 16/17/18;
  * "simple" (1-2 symbol) and normal code representations;
  * literals + LZ77 backward references (length/distance prefix codes
    with extra bits, the 120 near-distance plane codes) + color cache;
  * encoder producing valid single-group, no-transform VP8L streams
    (flat 8-bit literal codes) that libwebp or this decoder reads.

Out of scope, raising ``ValueError('webp: unsupported ...')`` honestly:
the four pixel transforms (predictor/color/subtract-green/palette),
meta-Huffman (multiple groups), and lossy VP8 — a vendored libwebp
would be needed for those (none in this sandbox).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ bits --


class _BitReader:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("webp: truncated bitstream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        """Scalar fields: LSB-first (VP8L convention)."""
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, v: int, n: int) -> None:
        """Huffman CODES go MSB-first (spec: 'prefix codes are stored
        most significant bit first'), unlike every other field."""
        for i in reversed(range(n)):
            self.bits.append((v >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# --------------------------------------------------------------- huffman --


class _Huffman:
    """Canonical Huffman decoder from code lengths (VP8L canonical
    order: shorter codes first, ties by symbol index)."""

    def __init__(self, lengths):
        lengths = list(lengths)
        self.single = None
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(used) == 1:
            self.single = used[0][1]
            return
        if not used:
            raise ValueError("webp: empty huffman code")
        # build canonical codes (MSB-first within the code)
        max_len = max(l for l, _ in used)
        bl_count = [0] * (max_len + 1)
        for l, _ in used:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        # decode table: map (len, code) → symbol via dict (simple, fine
        # for ≤280-symbol alphabets)
        self.table: dict[tuple[int, int], int] = {}
        for s, l in enumerate(lengths):
            if l > 0:
                self.table[(l, next_code[l])] = s
                next_code[l] += 1
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, l = 0, 0
        while l <= self.max_len:
            code = (code << 1) | br.read(1)
            l += 1
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise ValueError("webp: bad huffman code")


_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    """One Huffman code: 'simple' (≤2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if n_sym == 2:
            s1 = br.read(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Huffman(lengths)
    # normal: code-length code
    n_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_huff = _Huffman(cl_lengths)
    # optional limit on encoded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_huff.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


# ---------------------------------------------------------------- decode --

def _prefix_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix code → value (spec: 24 prefix codes with
    extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


_PLANE_CODES = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_to_dist(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    d = dx + dy * w
    return max(d, 1)


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes → RGB uint8 (h, w, 3).  Lossless (VP8L) subset only."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP file")
    pos = 12
    vp8l = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"VP8L":
            vp8l = data[pos + 8:pos + 8 + size]
            break
        if cid == b"VP8 " or cid == b"VP8X":
            raise ValueError(f"webp: unsupported chunk {cid!r} "
                             "(lossy/extended needs libwebp)")
        pos += 8 + size + (size & 1)
    if vp8l is None or len(vp8l) < 5:
        raise ValueError("webp: no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)   # alpha hint
    if br.read(3) != 0:
        raise ValueError("webp: bad version")
    while br.read(1):
        raise ValueError("webp: unsupported transform (needs libwebp)")
    # color cache
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("webp: bad color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta-huffman (entropy-image) not supported
    # NOTE: spec puts the meta-huffman bit before the cache bit at the
    # TOP level decode; our order matches libwebp's ReadHuffmanCodes for
    # the top-level image: color_cache_info THEN huffman image bit.
    if br.read(1):
        raise ValueError("webp: unsupported meta-huffman (needs libwebp)")
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    h_green = _read_code(br, green_size)
    h_red = _read_code(br, 256)
    h_blue = _read_code(br, 256)
    h_alpha = _read_code(br, 256)
    h_dist = _read_code(br, 40)

    n = w * h
    out = np.zeros((n, 4), dtype=np.uint8)  # RGBA
    i = 0
    while i < n:
        s = h_green.read(br)
        if s < 256:
            g = s
            r = h_red.read(br)
            b = h_blue.read(br)
            a = h_alpha.read(br)
            out[i] = (r, g, b, a)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            i += 1
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            dcode = h_dist.read(br)
            dist = _plane_to_dist(_prefix_value(br, dcode), w)
            if dist > i:
                raise ValueError("webp: bad back-reference")
            for _ in range(length):
                if i >= n:
                    break
                out[i] = out[i - dist]
                if cache is not None:
                    r, g, b, a = out[i]
                    argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                    cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
                i += 1
        else:
            argb = cache[s - 256 - 24]  # type: ignore[index]
            out[i] = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                      argb & 0xFF, (argb >> 24) & 0xFF)
            i += 1
    return out.reshape(h, w, 4)[:, :, :3].copy()


# ---------------------------------------------------------------- encode --

def encode_webp(pix: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → lossless WebP (VP8L) bytes.

    Simple-but-valid stream: no transforms, no color cache, no
    meta-Huffman, flat 8-bit literal codes for G/R/B, 1-symbol codes
    for alpha (always 255) and distance (unused).  ~32 bpp; the point
    is real-format round-trip, not ratio.
    """
    h, w = pix.shape[:2]
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("webp: image too large")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)   # no alpha
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no transform
    bw.write(0, 1)   # no color cache
    bw.write(0, 1)   # no meta-huffman

    def write_flat256(alphabet: int) -> None:
        """Normal code: symbols 0..255 all 8-bit (Kraft-complete)."""
        bw.write(0, 1)          # not simple
        # code-length code: only symbol '8' used, length 1... but a
        # 1-symbol code-length code needs its own valid lengths; give
        # symbols 8 and 0 length 1 each (0 used to terminate via
        # max_symbol so we never emit it).
        n_codes = 19
        lens = [0] * 19
        lens[8] = 1
        lens[0] = 1
        bw.write(n_codes - 4, 4)
        for i in range(n_codes):
            bw.write(lens[_CLC_ORDER[i]], 3)
        # use max_symbol to stop after 256 lengths
        bw.write(1, 1)          # use length
        # length_nbits = 2 + 2*slot; need to encode 256-2=254 → 8 bits
        bw.write(3, 3)          # slot 3 → 8 bits
        bw.write(254, 8)        # max_symbol = 2 + 254 = 256
        # canonical code for {0:1, 8:1} → 0 -> '0', 8 -> '1'
        for _ in range(256):
            bw.write_code(1, 1)  # symbol 8 (code '1')

    def write_single(sym: int, alphabet: int) -> None:
        bw.write(1, 1)          # simple
        bw.write(0, 1)          # 1 symbol
        bw.write(1, 1)          # 8-bit first symbol
        bw.write(sym, 8)

    write_flat256(256 + 24)     # green
    write_flat256(256)          # red
    write_flat256(256)          # blue
    write_single(255, 256)      # alpha (constant 255)
    write_single(0, 40)         # distance (never used)

    flat = pix.reshape(-1, 3)
    for r, g, b in flat:
        # flat 8-bit canonical code ⇒ code(sym) == sym, MSB-first
        bw.write_code(int(g), 8)
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
        # alpha: single-symbol code → zero bits

    body = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
