"""Multimodal (image/audio/video) column plumbing for training pipelines.

Gigablast stores page payloads as opaque compressed blobs in TitleRec
(``XmlDoc::setTitleRecBuf``/``Images.cpp`` thumbnails [U][M]); the
training-data generalization is a typed binary column + metadata, with
decode / feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` transforms.

What is REAL here (tested): the Spark plumbing — schemas, batch shapes,
partitioning, the full decode path for ppm/png/qnt (functions/images.py),
baseline JPEG (the pure-numpy ITU T.81 codec in functions/jpeg.py),
GIF87a/89a (the pure-numpy LZW codec in functions/gif.py), WAV PCM
audio (functions/wav.py → :func:`audio_features`), AVI/MJPEG video
(functions/avi.py → :func:`frame_sample`), pixel statistics,
perceptual hashes, nearest-neighbour resize, lossless WebP/VP8L
(functions/webp.py — canonical-Huffman + LZ77 + color-cache), and
lossy-VP8 webp keyframes (functions/vp8.py — bool coder, token trees,
WHT+DCT, intra prediction; probability tables repo-pinned), MPEG-1
audio Layers I–III incl. the L3 bit reservoir / short blocks / joint
stereo (functions/mpeg_audio.py), H.264/AVC video with BOTH intra and
inter coding (functions/h264.py — CAVLC levels, 4x4 transform +
Hadamard DC, I_4x4/I_16x16 prediction, P slices with P_Skip inference,
median-MV prediction and spec 6-tap quarter-pel motion compensation;
entropy-code index tables repo-pinned) and the MP4/ISO-BMFF container
(functions/mp4.py — avcC + full sample-table demux, stss sync table).
What is STUBBED (no ffmpeg in this container): B slices and vp9
surface as decode_ok=false rows, clearly marked, with the dispatch
and schema ready for a vendored codec.

Scale notes: blob batches dominate memory — ``mapInPandas`` streams
Arrow batches so an executor never holds a partition of blobs at once;
keep parquet row-groups small for binary columns
(``spark.sql.files.maxPartitionBytes`` sized to blob mix) and partition
by a uniform key (image_id hash), never by host/source (skew).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gigaspark.functions.images import FORMATS, decode_image, encode_image

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("entropy_bits", T.DoubleType()),
])

RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def decode_stub(fmt: str, data: bytes) -> np.ndarray:
    """Dispatch decode; ALL web image formats here are real codecs.

    jpg/jpeg route through the pure-numpy baseline codec
    (functions/jpeg.py); gif through the pure-numpy LZW codec
    (functions/gif.py — GIF87a/89a incl. interlace); webp through the
    pure-numpy VP8L lossless codec (functions/webp.py) OR the
    pure-numpy lossy-VP8 keyframe codec (functions/vp8.py — the RIFF
    chunk id dispatches; probability tables repo-pinned, see that
    module's header).  "webpv" selects the lossy flavor on the encode
    side only.
    """
    if fmt in FORMATS or fmt in ("jpeg", "jpgp", "jpg420", "gif", "webp",
                                 "webpv", "bmp", "ico", "tiff"):
        return decode_image(fmt, data)
    raise ValueError(f"unknown image format {fmt!r}")


def extract_features(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → per-image pixel statistics.

    One ``mapInPandas`` pass; all pixel math is whole-array numpy.
    Decode failures surface as decode_ok=false rows, never task failures
    (a 100 TB crawl always contains corrupt blobs).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FEATURE_SCHEMA.fieldNames()}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["image_id"], row["fmt"], row["decode_ok"] = iid, fmt, False
                try:
                    pix = decode_stub(fmt, bytes(blob))
                    gray = pix.astype(np.float64).mean(axis=2)
                    hist = np.bincount(pix.reshape(-1), minlength=256)
                    pdist = hist[hist > 0] / hist.sum()
                    row.update(
                        w=int(pix.shape[1]), h=int(pix.shape[0]), decode_ok=True,
                        mean_r=float(pix[:, :, 0].mean()),
                        mean_g=float(pix[:, :, 1].mean()),
                        mean_b=float(pix[:, :, 2].mean()),
                        std_gray=float(gray.std()),
                        entropy_bits=float(-(pdist * np.log2(pdist)).sum()),
                    )
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error):
                    # decode-shaped failures only (corrupt blobs on a
                    # 100 TB crawl are data, not bugs); anything else
                    # propagates as a real task error
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, FEATURE_SCHEMA)


def resize_nn(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour thumbnail pass (Images.cpp thumbnail analogue
    [U][M]); re-encodes to the row's own format."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            ids, blobs, ws, hs, fmts = [], [], [], [], []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = decode_stub(fmt, bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                h, w, _ = pix.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                thumb = pix[yi][:, xi]
                ids.append(iid)
                blobs.append(encode_image(fmt, thumb))
                ws.append(out_w); hs.append(out_h); fmts.append(fmt)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs,
                                "w": ws, "h": hs, "fmt": fmts})

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, RESIZE_SCHEMA)


def resize_area(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Box-filter thumbnail pass (Images.cpp area-mean downscale
    [U][M]): same plumbing as :func:`resize_nn` but alias-free —
    each output pixel averages its whole source window
    (functions/images.area_resize_rgb, summed-area table)."""
    from gigaspark.functions.images import area_resize_rgb

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs, fmts = [], [], [], [], []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = decode_stub(fmt, bytes(blob))
                except (NotImplementedError, ValueError):
                    continue
                thumb = area_resize_rgb(pix, out_w, out_h)
                ids.append(iid)
                blobs.append(encode_image(fmt, thumb))
                ws.append(out_w); hs.append(out_h); fmts.append(fmt)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs,
                                "w": ws, "h": hs, "fmt": fmts})

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, RESIZE_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("ahash64", T.LongType()),
    T.StructField("dhash64", T.LongType()),
    T.StructField("phash64", T.LongType()),
])


def image_phash(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → perceptual hashes (functions/phash.py).

    The image-side analogue of text SimHash: feed the signatures into
    :func:`gigaspark.operators.dedup.hamming_neardup_pairs` for banded
    near-duplicate detection without an all-pairs scan.
    """
    from gigaspark.functions.phash import ahash64, dhash64, phash64

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in PHASH_SCHEMA.fieldNames()}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["image_id"], row["fmt"], row["decode_ok"] = iid, fmt, False
                try:
                    pix = decode_stub(fmt, bytes(blob))
                    row.update(decode_ok=True, ahash64=ahash64(pix),
                               dhash64=dhash64(pix), phash64=phash64(pix))
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error):
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, PHASH_SCHEMA)


EXIF_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("has_exif", T.BooleanType()),
    T.StructField("orientation", T.IntegerType()),
    T.StructField("make", T.StringType()),
    T.StructField("model", T.StringType()),
    T.StructField("taken_at", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("norm_w", T.IntegerType()),
    T.StructField("norm_h", T.IntegerType()),
    T.StructField("norm_dhash64", T.LongType()),
])


def exif_metadata(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → EXIF provenance + orientation-normalized
    geometry and perceptual hash (functions/exif.py).

    The curation point: two phone photos of the same scene stored at
    orientations 6 and 1 hash DIFFERENTLY raw but identically after
    :func:`gigaspark.functions.exif.apply_orientation` — near-dup
    detection over a real camera corpus must run on ``norm_dhash64``,
    not the raw-pixel hash.  Blobs without EXIF report has_exif=false,
    orientation 1, norm == raw.  Same Arrow-batched mapInPandas shape
    and typed decode-error channel as every multimodal op here.
    """
    from gigaspark.functions.exif import apply_orientation, parse_exif
    from gigaspark.functions.phash import dhash64

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in EXIF_SCHEMA.fieldNames()}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["image_id"], row["fmt"] = iid, fmt
                row["decode_ok"], row["has_exif"] = False, False
                try:
                    data = bytes(blob)
                    meta = parse_exif(data)
                    ori = 1
                    if meta is not None:
                        ori = meta["orientation"]
                        row.update(has_exif=True, make=meta["make"],
                                   model=meta["model"],
                                   taken_at=meta["datetime"])
                    row["orientation"] = ori
                    pix = decode_stub(fmt, data)
                    norm = apply_orientation(pix, ori)
                    row.update(decode_ok=True,
                               w=int(pix.shape[1]), h=int(pix.shape[0]),
                               norm_w=int(norm.shape[1]),
                               norm_h=int(norm.shape[0]),
                               norm_dhash64=dhash64(norm))
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error):
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(_run, EXIF_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("dom_freq_hz", T.DoubleType()),
    T.StructField("centroid_hz", T.DoubleType()),
])


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, bytes, fmt) → per-clip audio statistics.

    REAL for fmt='wav' (the pure-python RIFF/WAVE PCM codec in
    functions/wav.py), fmt='flac' (the spec-exact lossless codec in
    functions/flac.py — fixed/LPC prediction, Rice coding, mid/side)
    AND fmt='mp3' (MPEG-1 Layers I, II and III, functions/mpeg_audio.py
    — spec-exact framing/allocation/scalefactors/requant, L3 side info/
    Huffman-ESC/alias/IMDCT; pinned DCT-IV filterbank + pinned L2/L3
    table families; L3 bit reservoir, short blocks, joint stereo and
    ogg/aac stay pinned out) — remaining stubs surface as
    decode_ok=false, same error channel as image decode.
    zcr = zero-crossing rate per sample on the channel-mean signal;
    rms/peak over all channels.
    """
    from gigaspark.functions.flac import decode_flac
    from gigaspark.functions.mpeg_audio import decode_mpeg1
    from gigaspark.functions.wav import decode_wav

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_SCHEMA.fieldNames()}
            for aid, blob, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["audio_id"], row["fmt"], row["decode_ok"] = aid, fmt, False
                try:
                    if fmt == "wav":
                        samples, rate = decode_wav(bytes(blob))
                    elif fmt == "flac":
                        samples, rate = decode_flac(bytes(blob))
                    elif fmt == "mp3":
                        samples, rate = decode_mpeg1(bytes(blob))
                    else:
                        raise NotImplementedError(f"no {fmt!r} codec in sandbox")
                    mono = samples.mean(axis=1)
                    # spectral features: rFFT magnitude of the mono
                    # signal, rectangular window (pinned — no taper, so
                    # a planted pure tone lands exactly on its bin)
                    dom = cen = 0.0
                    if len(mono) > 1:
                        spec = np.abs(np.fft.rfft(mono))
                        spec[0] = 0.0  # DC carries no pitch
                        freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
                        power = spec.sum()
                        if power > 0:
                            dom = float(freqs[int(spec.argmax())])
                            cen = float((freqs * spec).sum() / power)
                    row.update(
                        decode_ok=True, sample_rate=rate,
                        n_channels=int(samples.shape[1]),
                        duration_s=float(samples.shape[0] / rate),
                        rms=float(np.sqrt((samples ** 2).mean())),
                        peak=float(np.abs(samples).max()),
                        zcr=float((np.diff(np.signbit(mono)) != 0).mean())
                        if len(mono) > 1 else 0.0,
                        dom_freq_hz=dom, centroid_hz=cen,
                    )
                except (NotImplementedError, ValueError, struct.error):
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(_run, AUDIO_SCHEMA)


CUT_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_diff", T.DoubleType()),
    T.StructField("is_cut", T.BooleanType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def scene_cuts(videos: DataFrame, threshold: float = 24.0) -> DataFrame:
    """Shot-boundary detection over decoded frames: one row per frame
    transition (frame_idx = the later frame) with the mean absolute
    pixel difference vs the previous frame; ``is_cut`` when the mean
    jump reaches ``threshold`` gray levels (pinned rule — a hard cut
    moves most pixels at once; gradual pans/fades stay below).

    Scale shape: each video decodes once inside the Arrow batch; the
    consecutive-frame diff is a per-video sequential walk (exactly the
    per-element work mapInPandas exists for), never a cross-row join.
    Undecodable blobs emit one decode_ok=false row, same error channel
    as every other codec path.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gigaspark.functions.avi import decode_avi_frames
        from gigaspark.functions.gif import decode_gif_frames
        from gigaspark.functions.h264 import decode_h264
        from gigaspark.functions.jpeg import decode_jpeg
        from gigaspark.functions.mp4 import demux_mp4

        for pdf in batches:
            out = {k: [] for k in CUT_SCHEMA.fieldNames()}
            for vid, blob, fmt in zip(pdf["video_id"], pdf["bytes"],
                                      pdf["fmt"]):
                try:
                    if fmt == "avi-mjpg":
                        pix = [decode_jpeg(f)
                               for f in decode_avi_frames(bytes(blob))]
                    elif fmt == "gif-anim":
                        pix = decode_gif_frames(bytes(blob))
                    elif fmt == "h264":
                        pix = decode_h264(bytes(blob))
                    elif fmt == "mp4-avc":
                        pix = decode_h264(demux_mp4(bytes(blob)))
                    else:
                        raise NotImplementedError(f"no {fmt!r} codec")
                    for i in range(1, len(pix)):
                        d = float(np.abs(pix[i].astype(np.int16)
                                         - pix[i - 1].astype(np.int16)).mean())
                        out["video_id"].append(vid)
                        out["frame_idx"].append(i)
                        out["mean_diff"].append(d)
                        out["is_cut"].append(d >= threshold)
                        out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, struct.error):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(-1)
                    out["mean_diff"].append(None)
                    out["is_cut"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "fmt") \
        .mapInPandas(_run, CUT_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — REAL for fmt='avi-mjpg' (RIFF/AVI parse in
    functions/avi.py; each sampled frame is a standalone baseline JPEG),
    fmt='gif-anim' (the GIF89a animation model in functions/gif.py:
    sub-rectangle composition, transparency, disposal methods; sampled
    canvas frames re-emitted as lossless PNG), fmt='h264' (Annex B AVC
    streams — IDR and P pictures, functions/h264.py) and fmt='mp4-avc'
    (ISO-BMFF demux in functions/mp4.py feeding the same AVC decoder).
    Either way the emitted rows flow straight into the image ops above.

    Input (video_id, bytes, fmt); output one row per sampled frame
    (every ``every_n``-th, always including frame 0).  Codecs this
    container can't decode (B slices, vp9 — no ffmpeg) and corrupt
    blobs emit ONE decode_ok=false row instead of failing the task.
    One blob never amplifies memory: frames are sliced views of the
    container bytes (or composed canvases), emitted per Arrow batch.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gigaspark.functions.avi import decode_avi_frames
        from gigaspark.functions.gif import decode_gif_frames
        from gigaspark.functions.h264 import decode_h264
        from gigaspark.functions.mp4 import demux_mp4
        from gigaspark.functions.png import encode_png

        for pdf in batches:
            out = {k: [] for k in FRAME_SCHEMA.fieldNames()}
            for vid, blob, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    if fmt == "avi-mjpg":
                        frames = decode_avi_frames(bytes(blob))
                        out_fmt = "jpg"
                    elif fmt == "gif-anim":
                        frames = [encode_png(f)
                                  for f in decode_gif_frames(bytes(blob))]
                        out_fmt = "png"
                    elif fmt in ("h264", "mp4-avc"):
                        annexb = demux_mp4(bytes(blob)) \
                            if fmt == "mp4-avc" else bytes(blob)
                        frames = [encode_png(f) for f in
                                  decode_h264(annexb)]
                        out_fmt = "png"
                    else:
                        raise NotImplementedError(f"no {fmt!r} codec in sandbox")
                    for idx in range(0, len(frames), max(1, every_n)):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(frames[idx])
                        out["fmt"].append(out_fmt)
                        out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, struct.error):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(-1)
                    out["bytes"].append(None)
                    out["fmt"].append(fmt)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "fmt").mapInPandas(_run, FRAME_SCHEMA)


QUALITY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("brightness", T.DoubleType()),
    T.StructField("contrast", T.DoubleType()),
    T.StructField("sharpness", T.DoubleType()),
    T.StructField("colorfulness", T.DoubleType()),
    T.StructField("dark_frac", T.DoubleType()),
    T.StructField("bright_frac", T.DoubleType()),
    T.StructField("jpeg_quality", T.IntegerType()),
])


def image_quality(images: DataFrame) -> DataFrame:
    """Per-image curation metrics (LAION-style filter inputs, public):

    * ``brightness`` — mean gray (ITU-R 601 luma weights);
    * ``contrast`` — gray std;
    * ``sharpness`` — variance of the 4-neighbour Laplacian (the
      classic blur detector);
    * ``colorfulness`` — Hasler & Süsstrunk 2003 metric
      (``sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(μ²_rg + μ²_yb)``);
    * ``dark_frac`` / ``bright_frac`` — pixel share under 32 / over 223;
    * ``jpeg_quality`` — IJG quality factor estimated from the DQT
      header (jpeg formats only; header-read, no entropy decode).

    One ``mapInPandas`` pass, whole-array numpy per blob; corrupt blobs
    surface as decode_ok=false rows (same error channel as
    :func:`extract_features`).
    """
    from gigaspark.functions.jpeg import estimate_jpeg_quality

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in QUALITY_SCHEMA.fieldNames()}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["fmt"]):
                row = dict.fromkeys(out, None)
                row["image_id"], row["fmt"], row["decode_ok"] = iid, fmt, False
                try:
                    data = bytes(blob)
                    pix = decode_stub(fmt, data)
                    rgb = pix.astype(np.float64)
                    gray = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                            + 0.114 * rgb[:, :, 2])
                    lap = (4.0 * gray
                           - np.roll(gray, 1, 0) - np.roll(gray, -1, 0)
                           - np.roll(gray, 1, 1) - np.roll(gray, -1, 1))
                    lap = lap[1:-1, 1:-1] if min(gray.shape) > 2 else lap
                    rg = rgb[:, :, 0] - rgb[:, :, 1]
                    yb = 0.5 * (rgb[:, :, 0] + rgb[:, :, 1]) - rgb[:, :, 2]
                    colorful = (np.sqrt(rg.var() + yb.var())
                                + 0.3 * np.sqrt(rg.mean() ** 2
                                                + yb.mean() ** 2))
                    qf = (estimate_jpeg_quality(data)
                          if fmt in ("jpg", "jpeg", "jpgp", "jpg420")
                          else None)
                    row.update(
                        w=int(pix.shape[1]), h=int(pix.shape[0]),
                        decode_ok=True,
                        brightness=float(gray.mean()),
                        contrast=float(gray.std()),
                        sharpness=float(lap.var()),
                        colorfulness=float(colorful),
                        dark_frac=float((gray < 32).mean()),
                        bright_frac=float((gray > 223).mean()),
                        jpeg_quality=qf,
                    )
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error):
                    pass  # corrupt blob → decode_ok=false row
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (images.select("image_id", "bytes", "fmt")
            .mapInPandas(_run, QUALITY_SCHEMA))
