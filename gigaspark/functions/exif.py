"""EXIF metadata: JPEG APP1 / TIFF IFD0 parse + build, pure python.

SURVEY C8 (media handling, Images.cpp analogue [U][M]) + the
training-pipeline mandate: a real image corpus carries camera EXIF, and
two of its fields are load-bearing for curation —

  * **Orientation (tag 0x0112)**: phones store sensor-rotated pixels
    with a display transform; a pipeline that ignores it trains on
    sideways images and computes wrong perceptual hashes.
    :func:`apply_orientation` normalizes decoded pixels (numpy
    whole-array rot90/flips, never per-pixel python).
  * **DateTime / Make / Model / ImageDescription** (0x0132 / 0x010F /
    0x0110 / 0x010E): provenance metadata for dedup tie-breaks and
    sampling strata.

Wire format (public spec: EXIF 2.3 §4.5, TIFF 6.0 §2): a JPEG APP1
segment whose payload is ``Exif\\0\\0`` + a self-contained TIFF file —
byte-order mark ``II``/``MM``, magic 42, IFD0 = count + 12-byte entries
``(tag u16, type u16, count u32, value-or-offset u32)``; values wider
than 4 bytes live at an offset from the TIFF header start.  Types
handled: 2 ASCII (NUL-terminated), 3 SHORT, 4 LONG — the tags above use
only these.  Raw ``.tiff`` blobs parse through the same IFD walk.

Corrupt input follows the repo's multimodal error contract: truncated /
inconsistent structures raise ``ValueError`` (data, not bugs); blobs
without EXIF return ``None`` from :func:`parse_exif` (absence is not an
error).
"""

from __future__ import annotations

import struct

import numpy as np

TAG_DESCRIPTION = 0x010E
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132

_TYPE_ASCII, _TYPE_SHORT, _TYPE_LONG = 2, 3, 4
_TYPE_SIZE = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4}


# --------------------------------------------------------------------- build

def build_exif_tiff(orientation: int = 1, make: str | None = None,
                    model: str | None = None, datetime: str | None = None,
                    description: str | None = None) -> bytes:
    """Self-contained little-endian TIFF holding one IFD0 with the given
    tags (entries tag-sorted per TIFF 6.0; ASCII values in the data area
    after the IFD).  This is the payload both the APP1 splice and the
    raw-TIFF tests plant."""
    entries: list[tuple[int, int, int, bytes]] = []

    def ascii_entry(tag: int, s: str):
        raw = s.encode("ascii") + b"\x00"
        entries.append((tag, _TYPE_ASCII, len(raw), raw))

    if description is not None:
        ascii_entry(TAG_DESCRIPTION, description)
    if make is not None:
        ascii_entry(TAG_MAKE, make)
    if model is not None:
        ascii_entry(TAG_MODEL, model)
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside 1..8")
    entries.append((TAG_ORIENTATION, _TYPE_SHORT, 1,
                    struct.pack("<H", orientation) + b"\x00\x00"))
    if datetime is not None:
        ascii_entry(TAG_DATETIME, datetime)
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    body = bytearray()
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, raw in entries:
        nbytes = cnt * _TYPE_SIZE[typ]
        if nbytes <= 4:
            val = raw[:4].ljust(4, b"\x00")
        else:
            val = struct.pack("<I", data_off + len(body))
            body += raw
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    return bytes(out) + bytes(body)


def insert_app1(jpeg: bytes, tiff: bytes) -> bytes:
    """Splice an EXIF APP1 segment right after SOI (where cameras put
    it, before JFIF/quant segments — decoders skip unknown APPn)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    payload = b"Exif\x00\x00" + tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds segment size")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


# --------------------------------------------------------------------- parse

def _parse_tiff_ifd0(tiff: bytes) -> dict:
    if len(tiff) < 8:
        raise ValueError("exif: TIFF header truncated")
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"exif: bad byte-order mark {order!r}")
    magic, ifd_off = struct.unpack(e + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    if ifd_off + 2 > len(tiff):
        raise ValueError("exif: IFD0 offset out of range")
    (n,) = struct.unpack(e + "H", tiff[ifd_off:ifd_off + 2])
    out: dict = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(tiff):
            raise ValueError("exif: IFD entry truncated")
        tag, typ, cnt = struct.unpack(e + "HHI", tiff[off:off + 8])
        if typ not in _TYPE_SIZE:
            continue  # rationals etc. — not ours, skip per spec
        nbytes = cnt * _TYPE_SIZE[typ]
        if nbytes <= 4:
            raw = tiff[off + 8:off + 12][:nbytes]
        else:
            (voff,) = struct.unpack(e + "I", tiff[off + 8:off + 12])
            if voff + nbytes > len(tiff):
                raise ValueError("exif: value offset out of range")
            raw = tiff[voff:voff + nbytes]
        if typ == _TYPE_ASCII:
            val = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == _TYPE_SHORT:
            val = struct.unpack(e + "H", raw[:2])[0]
        else:
            val = struct.unpack(e + "I", raw[:4])[0]
        out[tag] = val
    return out


def parse_exif(data: bytes) -> dict | None:
    """EXIF fields from a JPEG (APP1 scan) or raw TIFF blob.

    Returns ``{"orientation": int, "make": str|None, "model": str|None,
    "datetime": str|None, "description": str|None}`` or ``None`` when
    the blob carries no EXIF (bare JPEG, PNG, GIF, ...).  Orientation
    defaults to 1 when the IFD lacks the tag."""
    tags = None
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xDA:  # SOS — entropy data follows, stop
                break
            (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
            if seglen < 2 or pos + 2 + seglen > len(data):
                raise ValueError("exif: JPEG segment truncated")
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                tags = _parse_tiff_ifd0(data[pos + 10:pos + 2 + seglen])
                break
            pos += 2 + seglen
    elif data[:2] in (b"II", b"MM"):
        tags = _parse_tiff_ifd0(data)
    ours = (TAG_ORIENTATION, TAG_MAKE, TAG_MODEL, TAG_DATETIME,
            TAG_DESCRIPTION)
    if tags is None or not any(t in tags for t in ours):
        # an IFD with none of the provenance tags (e.g. a bare pixel
        # TIFF) carries no EXIF story — absence, not an error
        return None
    return {
        "orientation": int(tags.get(TAG_ORIENTATION, 1)),
        "make": tags.get(TAG_MAKE),
        "model": tags.get(TAG_MODEL),
        "datetime": tags.get(TAG_DATETIME),
        "description": tags.get(TAG_DESCRIPTION),
    }


# ------------------------------------------------------------- orientation

def apply_orientation(pix: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize decoded (h, w, c) pixels to display orientation (the
    PIL ``exif_transpose`` table, EXIF 2.3 §4.6.4.A) — whole-array numpy
    views/rotations, no per-pixel python:

      1 identity · 2 mirror-H · 3 rot180 · 4 mirror-V · 5 transpose ·
      6 rot270° CCW (=90° CW) · 7 transverse · 8 rot90° CCW
    """
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside 1..8")
    if orientation == 2:
        return pix[:, ::-1]
    if orientation == 3:
        return pix[::-1, ::-1]
    if orientation == 4:
        return pix[::-1]
    if orientation == 5:
        return np.swapaxes(pix, 0, 1)
    if orientation == 6:
        return np.rot90(pix, 3)
    if orientation == 7:
        return np.swapaxes(pix[::-1, ::-1], 0, 1)
    if orientation == 8:
        return np.rot90(pix, 1)
    return pix
