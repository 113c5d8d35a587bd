"""TIFF baseline codec: roundtrip, byte orders, strips, PackBits."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gigaspark.functions.tiff import _unpackbits, decode_tiff, encode_tiff
from gigaspark.functions.images import decode_image, encode_image


def _img(h, w, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (5, 3), (1, 1), (11, 7)])
def test_roundtrip_exact(h, w):
    pix = _img(h, w)
    assert np.array_equal(decode_tiff(encode_tiff(pix)), pix)


def _packbits(row: bytes) -> bytes:
    """Reference PackBits compressor (literal-only is valid; mix in
    repeats for runs >= 3) used to build decoder fixtures."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i
            while (j < n and j - i < 128
                   and not (j + 2 < n and row[j] == row[j + 1] == row[j + 2])):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def test_unpackbits_reference():
    for payload in (b"\x00" * 20, b"abcabcabc", bytes(range(50)),
                    b"aaaabbbbccccd", b"\xff" * 300):
        assert _unpackbits(_packbits(payload), len(payload)) == payload


def test_bigendian_multistrip_packbits_decode():
    # hand-build a big-endian TIFF: 2 strips of 2 rows, PackBits
    pix = np.repeat(np.arange(4 * 3 * 4, dtype=np.uint8).reshape(4, 3, 4-1),
                    1, axis=0) if False else _img(4, 3, seed=9)
    h, w = 4, 3
    strips = [pix[0:2].tobytes(), pix[2:4].tobytes()]
    comp = [_packbits(s) for s in strips]

    def entry(tag, typ, cnt, val):
        return struct.pack(">HHII", tag, typ, cnt, val)

    bps_off = 8
    ifd_off = bps_off + 6
    n_entries = 9
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    off_tbl = after_ifd          # strip offsets array (2 x u32)
    cnt_tbl = after_ifd + 8      # strip counts array
    data0 = cnt_tbl + 8
    data1 = data0 + len(comp[0])
    ifd = struct.pack(">H", n_entries)
    ifd += entry(256, 3, 1, w << 16)   # SHORT value left-justified in MM
    ifd += entry(257, 3, 1, h << 16)
    ifd += entry(258, 3, 3, bps_off)
    ifd += entry(259, 3, 1, 32773 << 16)
    ifd += entry(262, 3, 1, 2 << 16)
    ifd += entry(273, 4, 2, off_tbl)
    ifd += entry(277, 3, 1, 3 << 16)
    ifd += entry(278, 3, 1, 2 << 16)
    ifd += entry(279, 4, 2, cnt_tbl)
    ifd += struct.pack(">I", 0)
    blob = (b"MM\x00*" + struct.pack(">I", ifd_off)
            + struct.pack(">HHH", 8, 8, 8) + ifd
            + struct.pack(">II", data0, data1)
            + struct.pack(">II", len(comp[0]), len(comp[1]))
            + comp[0] + comp[1])
    assert np.array_equal(decode_tiff(blob), pix)


def test_registry_dispatch():
    pix = _img(6, 6, seed=2)
    assert np.array_equal(decode_image("tiff", encode_image("tiff", pix)), pix)
