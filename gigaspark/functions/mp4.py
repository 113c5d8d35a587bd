"""ISO Base Media File Format (MP4) mux/demux for AVC video — pure
python, public spec (ISO/IEC 14496-12 box model + 14496-15 avcC).

A crawled video corpus carries H.264 in MP4, not raw Annex B: the
container work (box tree, sample tables, parameter-set placement in
``avcC``, length-prefixed NALs in ``mdat``) is what a fetch pipeline
must parse before any codec runs.  Reference behaviour: Gigablast's
content handlers sniff + parse containers before media decode [U];
this module is the Spark-side analogue feeding functions/h264.py, the
same way functions/avi.py feeds the MJPEG path.

SPEC-EXACT: box framing (32-bit size + fourcc, size==1 -> 64-bit
largesize), the full demux walk over ftyp/moov/trak/mdia/minf/stbl,
``avcC`` (configurationVersion, profile/level, lengthSizeMinusOne,
SPS/PPS arrays), and the sample tables — stsd/stts/stsc/stsz/stco
(and co64) — including the stsc chunk-run expansion rule (each entry
applies until the next entry's first_chunk).  The muxer writes one
video track with a single chunk; the demuxer handles the general
multi-chunk layout.

Honest limits, raising ValueError: encrypted tracks, fragmented mp4
(moof), edit lists affecting sample timing (elst is skipped), and
codecs other than avc1 in the first video track.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + body)


def _split_annexb(data: bytes) -> list[tuple[int, bytes]]:
    """Annex B -> [(nal_type, ebsp payload incl. header byte)]."""
    out = []
    i, n = 0, len(data)
    starts = []
    while i + 3 <= n:
        if data[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else n
        while end > s and data[end - 1] == 0 and k + 1 < len(starts):
            end -= 1
        if end > s:
            out.append((data[s] & 0x1F, data[s:end]))
    if not out:
        raise ValueError("no NAL units in Annex B input")
    return out


def mux_mp4(annexb: bytes, width: int, height: int, fps: int = 30) -> bytes:
    """Wrap an Annex B AVC stream (SPS+PPS+IDR NALs, e.g. from
    functions/h264.encode_h264) into a minimal valid MP4."""
    nals = _split_annexb(annexb)
    sps = [p for t, p in nals if t == 7]
    pps = [p for t, p in nals if t == 8]
    if not sps or not pps:
        raise ValueError("Annex B input lacks SPS/PPS")
    samples = [struct.pack(">I", len(p)) + p
               for t, p in nals if t in (1, 5)]
    sync = [i + 1 for i, (t, _p) in
            enumerate([(t, p) for t, p in nals if t in (1, 5)])
            if t == 5]
    if not samples:
        raise ValueError("no coded pictures")
    mdat_payload = b"".join(samples)

    # avcC: 4-byte NAL length prefix (lengthSizeMinusOne = 3)
    avcc = bytes([1, sps[0][1], sps[0][2], sps[0][3], 0xFC | 3,
                  0xE0 | len(sps)])
    for s in sps:
        avcc += struct.pack(">H", len(s)) + s
    avcc += bytes([len(pps)])
    for p in pps:
        avcc += struct.pack(">H", len(p)) + p

    avc1 = _box(b"avc1", (
        b"\x00" * 6 + struct.pack(">H", 1) +          # reserved, dref idx
        b"\x00" * 16 +                                 # pre_defined/reserved
        struct.pack(">HH", width, height) +
        struct.pack(">II", 0x00480000, 0x00480000) +   # 72 dpi
        b"\x00" * 4 + struct.pack(">H", 1) +           # frame_count
        b"\x00" * 32 +                                 # compressorname
        struct.pack(">Hh", 0x0018, -1) +               # depth, pre_defined
        _box(b"avcC", avcc)))

    n = len(samples)
    timescale = fps
    stbl = _box(b"stbl", b"".join([
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1),
        _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1)),
        _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1)),
        _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
              b"".join(struct.pack(">I", len(s)) for s in samples)),
        # sync (random-access) samples: the IDR pictures
        _full(b"stss", 0, 0, struct.pack(">I", len(sync)) +
              b"".join(struct.pack(">I", s) for s in sync)),
        # chunk offset patched below once the mdat position is known
        _full(b"stco", 0, 0, struct.pack(">II", 1, 0)),
    ]))
    minf = _box(b"minf", b"".join([
        _full(b"vmhd", 0, 1, b"\x00" * 8),
        _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) +
                            _full(b"url ", 0, 1, b""))),
        stbl]))
    mdia = _box(b"mdia", b"".join([
        _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, n,
                                         0x55C4, 0)),
        _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
              b"\x00" * 12 + b"gigaspark\x00"),
        minf]))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, n) +
                 b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) +
                 struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, n) +
                 struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10 +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) + b"\x00" * 24 +
                 struct.pack(">I", 2))
    moov_wo_fix = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat_off = len(ftyp) + len(moov_wo_fix) + 8
    moov = moov_wo_fix.replace(
        _full(b"stco", 0, 0, struct.pack(">II", 1, 0)),
        _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off)), 1)
    return ftyp + moov + _box(b"mdat", mdat_payload)


# ------------------------------------------------------------------ #
# Demux                                                                #
# ------------------------------------------------------------------ #

def _walk(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each box in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < 8 or pos + size > hi:
            raise ValueError("bad box size")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, lo: int, hi: int, path: list[bytes]):
    """Return (body_lo, body_hi) of the first box at ``path``."""
    for fourcc, blo, bhi in _walk(data, lo, hi):
        if fourcc == path[0]:
            if len(path) == 1:
                return blo, bhi
            return _find(data, blo, bhi, path[1:])
    raise ValueError(f"box {b'/'.join(path)!r} not found")


def _find_video_stbl(data: bytes) -> tuple[int, int]:
    moov = _find(data, 0, len(data), [b"moov"])
    for fourcc, blo, bhi in _walk(data, *moov):
        if fourcc != b"trak":
            continue
        try:
            hdlr = _find(data, blo, bhi, [b"mdia", b"hdlr"])
        except ValueError:
            continue
        if data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        return _find(data, blo, bhi, [b"mdia", b"minf", b"stbl"])
    raise ValueError("no video track")


def demux_mp4(data: bytes) -> bytes:
    """MP4 -> Annex B AVC byte stream (SPS+PPS from avcC, then every
    sample's NALs), ready for functions/h264.decode_h264."""
    for fourcc, _, _ in _walk(data, 0, len(data)):
        if fourcc == b"moof":
            raise ValueError("fragmented mp4 not in this subset")
    stbl = _find_video_stbl(data)
    stsd = _find(data, *stbl, [b"stsd"])
    entry_count = struct.unpack(">I", data[stsd[0] + 4:stsd[0] + 8])[0]
    if entry_count < 1:
        raise ValueError("empty stsd")
    fourcc, elo, ehi = next(_walk(data, stsd[0] + 8, stsd[1]))
    if fourcc != b"avc1":
        raise ValueError(f"codec {fourcc!r} not in this subset")
    avcc = _find(data, elo + 78, ehi, [b"avcC"])  # 78 = VisualSampleEntry
    cfg = data[avcc[0]:avcc[1]]
    if cfg[0] != 1:
        raise ValueError("bad avcC version")
    nal_len_size = (cfg[4] & 3) + 1
    out = bytearray()
    pos = 6
    n_sps = cfg[5] & 0x1F
    for _ in range(n_sps):
        ln = struct.unpack(">H", cfg[pos:pos + 2])[0]
        out += b"\x00\x00\x00\x01" + cfg[pos + 2:pos + 2 + ln]
        pos += 2 + ln
    n_pps = cfg[pos]
    pos += 1
    for _ in range(n_pps):
        ln = struct.unpack(">H", cfg[pos:pos + 2])[0]
        out += b"\x00\x00\x00\x01" + cfg[pos + 2:pos + 2 + ln]
        pos += 2 + ln

    # ---- sample tables ---------------------------------------------
    stsz = _find(data, *stbl, [b"stsz"])
    fixed, count = struct.unpack(">II", data[stsz[0] + 4:stsz[0] + 12])
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack(f">{count}I",
                                   data[stsz[0] + 12:stsz[0] + 12 + 4 * count]))
    try:
        stco = _find(data, *stbl, [b"stco"])
        nchunks = struct.unpack(">I", data[stco[0] + 4:stco[0] + 8])[0]
        offsets = list(struct.unpack(
            f">{nchunks}I", data[stco[0] + 8:stco[0] + 8 + 4 * nchunks]))
    except ValueError:
        co64 = _find(data, *stbl, [b"co64"])
        nchunks = struct.unpack(">I", data[co64[0] + 4:co64[0] + 8])[0]
        offsets = list(struct.unpack(
            f">{nchunks}Q", data[co64[0] + 8:co64[0] + 8 + 8 * nchunks]))
    stsc = _find(data, *stbl, [b"stsc"])
    nruns = struct.unpack(">I", data[stsc[0] + 4:stsc[0] + 8])[0]
    runs = [struct.unpack(">III", data[stsc[0] + 8 + 12 * i:
                                       stsc[0] + 20 + 12 * i])
            for i in range(nruns)]

    # expand stsc runs -> samples-per-chunk for every chunk
    spc = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else nchunks
        spc += [per] * (last - first + 1)
    if len(spc) != nchunks:
        raise ValueError("stsc/stco disagree on chunk count")

    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(spc[ci]):
            if si >= count:
                break
            size = sizes[si]
            end = pos + size
            if end > len(data):
                raise ValueError("sample beyond file end")
            # split the sample into length-prefixed NALs
            p = pos
            while p < end:
                ln = int.from_bytes(data[p:p + nal_len_size], "big")
                p += nal_len_size
                if ln == 0 or p + ln > end:
                    raise ValueError("bad NAL length in sample")
                out += b"\x00\x00\x00\x01" + data[p:p + ln]
                p += ln
            pos = end
            si += 1
    if si != count:
        raise ValueError("sample count mismatch")
    return bytes(out)
