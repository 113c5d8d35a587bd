"""Pure-numpy RIFF/WAVE PCM codec (audio half of the multimodal axis).

Public-spec container: RIFF('WAVE') with an 'fmt ' chunk (PCM format
tag 1, 8- or 16-bit) and a 'data' chunk of interleaved frames —
Multimedia Programming Interface and Data Specifications 1.0 (IBM /
Microsoft, 1991).  The reference indexes page payloads as opaque blobs
(``XmlDoc::setTitleRecBuf`` [U]); the training-data generalization
treats audio as a typed binary column, and this codec makes the decode
stage REAL for the most common uncompressed web-audio container.

decode_wav(bytes) -> (samples float64 in [-1, 1] shaped (n, channels),
sample_rate).  encode_wav(samples, rate, bits) -> bytes.  Unknown
chunks are skipped (real-world WAVs carry LIST/INFO/fact chunks);
truncated or non-PCM input raises ValueError.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """samples float in [-1, 1], shape (n,) or (n, channels) → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    elif bits == 8:
        pcm = np.clip(np.round(samples * 127.0) + 128, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    data = pcm.tobytes()
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] shape (n, ch), rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt_chunk = pcm = None
    while pos + 8 <= end:
        cid, size = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: short fmt chunk")
            fmt_chunk = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or pcm is None:
        raise ValueError("wav: missing fmt/data chunk")
    tag, ch, rate, _, _, bits = fmt_chunk
    if tag != 1:
        raise ValueError(f"wav: only PCM (tag 1) supported, got tag {tag}")
    if ch < 1:
        raise ValueError("wav: zero channels")
    if bits == 16:
        arr = np.frombuffer(pcm[:len(pcm) // (2 * ch) * 2 * ch], dtype="<i2")
        samples = arr.astype(np.float64) / 32768.0
    elif bits == 8:
        arr = np.frombuffer(pcm[:len(pcm) // ch * ch], dtype=np.uint8)
        samples = (arr.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    return samples.reshape(-1, ch), int(rate)
