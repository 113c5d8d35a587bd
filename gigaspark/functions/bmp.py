"""Pure-numpy BMP and ICO codecs (SURVEY §2.8 C8 — Images.cpp handles
the common web formats [U][M]; BMP/ICO round out the container set next
to png/jpeg/gif/webp).

BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp BI_RGB on encode;
decode additionally accepts 32bpp BGRA and top-down (negative height)
images.  Rows are BGR, 4-byte padded, bottom-up — all handled with
whole-array numpy ops (flip + slice), no per-pixel Python.

ICO: ICONDIR container.  The encoder emits a PNG payload (valid per the
format since Vista and what browsers ship for favicons); the decoder
accepts both PNG payloads and classic DIB payloads (BITMAPINFOHEADER
with doubled height + 1-bit AND mask).
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HDR = struct.Struct("<2sIHHI")
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def _row_stride(w: int, bpp: int) -> int:
    return ((w * bpp + 31) // 32) * 4


def encode_bmp(pix: np.ndarray) -> bytes:
    """24bpp BI_RGB bottom-up BMP from an (h, w, 3) RGB array."""
    h, w, _ = pix.shape
    stride = _row_stride(w, 24)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = rows.tobytes()
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    return (_BMP_FILE_HDR.pack(b"BM", off + len(data), 0, 0, off)
            + _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(data),
                                 2835, 2835, 0, 0)
            + data)


def _decode_dib(buf: bytes, ico_mask: bool = False) -> np.ndarray:
    """Decode a BITMAPINFOHEADER DIB (24/32bpp BI_RGB).  With
    ``ico_mask`` the header height is doubled (XOR image + AND mask)."""
    (hsz, w, h, _planes, bpp, comp, _isz, _xp, _yp,
     ncolors, _imp) = _BMP_INFO_HDR.unpack_from(buf, 0)
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported DIB: bpp={bpp} compression={comp}")
    if ico_mask:
        h //= 2
    topdown = h < 0
    h = abs(h)
    off = hsz + 4 * ncolors
    stride = _row_stride(w, bpp)
    nb = bpp // 8
    rows = np.frombuffer(buf, dtype=np.uint8,
                         count=h * stride, offset=off).reshape(h, stride)
    img = rows[:, : w * nb].reshape(h, w, nb)[:, :, 2::-1]  # BGR(A)->RGB
    return np.ascontiguousarray(img if topdown else img[::-1])


def decode_bmp(data: bytes) -> np.ndarray:
    magic, _size, _r1, _r2, off = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    # _decode_dib computes the pixel offset from the header itself;
    # honor an explicit data offset when it disagrees (gap files)
    hsz = struct.unpack_from("<I", data, _BMP_FILE_HDR.size)[0]
    (_, w, h, _p, bpp, comp, _isz, _xp, _yp, ncol, _imp) = \
        _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    expect = _BMP_FILE_HDR.size + hsz + 4 * ncol
    body = data[_BMP_FILE_HDR.size:]
    if off != expect:
        hdr = body[: hsz + 4 * ncol]
        body = hdr + data[off:]
    return _decode_dib(body)


_ICONDIR = struct.Struct("<HHH")
_ICONENTRY = struct.Struct("<BBBBHHII")
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_ico(pix: np.ndarray) -> bytes:
    """Single-image ICO with a PNG payload (favicon style).  Dimensions
    must be <= 256 (the format's limit; 0 encodes 256)."""
    from gigaspark.functions.images import encode_png

    h, w, _ = pix.shape
    if w > 256 or h > 256:
        raise ValueError("ICO images are at most 256x256")
    payload = encode_png(pix)
    off = _ICONDIR.size + _ICONENTRY.size
    return (_ICONDIR.pack(0, 1, 1)
            + _ICONENTRY.pack(w % 256, h % 256, 0, 0, 1, 32,
                              len(payload), off)
            + payload)


def encode_ico_dib(pix: np.ndarray) -> bytes:
    """Single-image ICO with a classic 24bpp DIB payload (XOR image +
    all-opaque AND mask) — exercises the legacy decode path."""
    h, w, _ = pix.shape
    if w > 256 or h > 256:
        raise ValueError("ICO images are at most 256x256")
    stride = _row_stride(w, 24)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)
    mask_stride = _row_stride(w, 1)
    mask = np.zeros((h, mask_stride), dtype=np.uint8)  # 0 = opaque
    payload = (_BMP_INFO_HDR.pack(40, w, 2 * h, 1, 24, 0,
                                  h * stride + h * mask_stride,
                                  0, 0, 0, 0)
               + rows.tobytes() + mask.tobytes())
    off = _ICONDIR.size + _ICONENTRY.size
    return (_ICONDIR.pack(0, 1, 1)
            + _ICONENTRY.pack(w % 256, h % 256, 0, 0, 1, 24,
                              len(payload), off)
            + payload)


def decode_ico(data: bytes) -> np.ndarray:
    """Decode the FIRST image of an ICO (PNG or 24/32bpp DIB payload)."""
    reserved, typ, count = _ICONDIR.unpack_from(data, 0)
    if reserved != 0 or typ != 1 or count < 1:
        raise ValueError("not an ICO")
    (_w, _h, _nc, _r, _planes, _bpp, nbytes, off) = \
        _ICONENTRY.unpack_from(data, _ICONDIR.size)
    payload = data[off: off + nbytes]
    if payload.startswith(_PNG_SIG):
        from gigaspark.functions.images import decode_png

        return decode_png(payload)
    return _decode_dib(payload, ico_mask=True)
