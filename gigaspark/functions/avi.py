"""Minimal pure-python AVI (RIFF) container with an MJPEG video stream.

Public-spec container (Microsoft "AVI RIFF File Reference"): RIFF('AVI ')
→ LIST('hdrl') ('avih' + LIST('strl': 'strh','strf')) → LIST('movi')
holding one '00dc' chunk per frame; MJPEG means each chunk body is a
standalone baseline JPEG, which our pure-numpy codec
(:mod:`gigaspark.functions.jpeg`) can decode — so video frame-sampling
in :mod:`gigaspark.operators.multimodal` is REAL end-to-end for
'avi-mjpg', not a stub.

The reference treats page payloads as opaque compressed blobs [U]; this
is the typed-binary-column generalization for video.  Only the subset a
frame sampler needs is implemented: fixed-fps single video stream,
frame extraction in stored order.  Audio streams and index chunks are
skipped on read; unknown chunks tolerated.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 30,
                     quality: int = 75) -> bytes:
    """RGB frame arrays (h, w, 3) → AVI bytes with one MJPG stream."""
    from gigaspark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    jpgs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpgs)
    max_len = max(len(j) for j in jpgs)

    # strh: video stream header (fccType 'vids', handler 'MJPG')
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", b"MJPG", 0, 0, 0, 0,
                       1, fps,          # dwScale / dwRate → fps
                       0, n, max_len, 0xFFFFFFFF, 0, 0, 0, int(w), int(h))
    # strf: BITMAPINFOHEADER, biCompression 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1000000 // fps,  # dwMicroSecPerFrame
                       max_len * fps, 0, 0x10,  # dwFlags: AVIF_HASINDEX-less
                       n, 0, 1, max_len, w, h, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpgs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of per-frame JPEG byte strings (stored order).

    Accepts '00dc'/'00db' chunks of the first video stream; skips
    everything else (headers, audio '01wb', 'idx1', JUNK).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def _walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_lo, body_hi = pos + 8, pos + 8 + size
            if body_hi > hi:
                raise ValueError("avi: truncated chunk")
            if cid == b"LIST":
                _walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif cid in (b"00dc", b"00db") and size > 0:
                frames.append(data[body_lo:body_hi])
            pos = body_hi + (size & 1)

    _walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]))
    if not frames:
        raise ValueError("avi: no video frames found")
    return frames
