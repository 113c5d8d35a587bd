"""WARC-style crawl-archive records (ISO 28500 / WARC 1.0, public).

The reference stores fetched pages in its own Rdb record format
(Titledb [U][M]); the interoperable equivalent every large crawl ships
(Common Crawl, IIPC tools) is WARC: a self-describing record framing of
``WARC/1.0`` + named headers + ``Content-Length``-delimited payload.
This module builds and re-parses that framing **in-plan**:

* :func:`warc_record_col` — ONE Column expression (string concat, JVM
  codegen) emitting a spec-shaped ``response`` record per row.  The
  record id is pinned to ``<urn:gigaspark:{id}>`` (a real archive uses
  uuid4; pinned so the round-trip is deterministic and oracle-able).
* :func:`parse_warc_records` — Column-only field extraction for text
  payloads: named headers via ``regexp_extract``, payload via
  ``locate(CRLF CRLF)`` + ``substr`` bounded by the parsed
  ``Content-Length`` (the spec's framing rule — NEVER split on the
  version line, which may occur inside payloads).
* :func:`parse_warc_file_pandas` — mapInPandas walker for
  concatenated multi-record FILES with arbitrary **binary** payloads
  (images): sequential Content-Length hops, vectorized per Arrow
  batch; this is the ingest path for real ``.warc`` segment files.

Scale shape: build and text-parse are narrow per-row projections (no
shuffle, whole-stage codegen); file parse is an Arrow-batched
mapInPandas whose unit of work is one archive segment — exactly how a
100 TB Common-Crawl-shaped corpus is laid out (~1 GB segments), so
parallelism = segment count and no record ever crosses a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

CRLF = "\r\n"

WARC_PARSED_SCHEMA = (
    "warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length int, "
    "payload binary"
)


def warc_record_col(rec_id: Column, date: Column, uri: Column,
                    mime: Column, payload: Column) -> Column:
    """A WARC/1.0 ``response`` record as ONE string Column.

    ``payload`` must be a string Column here (text payloads); binary
    payload files are written by concatenating these headers with the
    raw bytes at the sink (same framing law, see module header).
    ``Content-Length`` counts payload BYTES (``octet_length``), not
    characters — the one place text and binary framing could drift.
    """
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:gigaspark:"), rec_id.cast("string"),
        F.lit(">" + CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("Content-Type: "), mime, F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"), F.lit(CRLF),
        F.lit(CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def _hdr(rec: Column, name: str) -> Column:
    return F.regexp_extract(rec, name + r": ([^\r\n]+)" + CRLF, 1)


def parse_warc_records(df: DataFrame, rec_col: str = "record") -> DataFrame:
    """Parse one text-payload WARC record per row, Column-only.

    Payload bounds: first blank line (the header terminator — headers
    themselves cannot contain ``CRLF CRLF``) to end-of-record minus the
    trailing ``CRLF CRLF``.  End-trimming instead of Content-Length
    hopping keeps the extraction CHARACTER-safe for multibyte UTF-8
    payloads (Spark ``substr``/``locate`` are char-based while
    ``Content-Length`` counts bytes); the parsed length is still
    emitted, and byte-accurate Content-Length walking — required once
    records are concatenated into files — lives in
    :func:`parse_warc_file_pandas`.  A payload that embeds header-
    lookalike text (even ``WARC/1.0``) cannot confuse either bound.
    """
    rec = F.col(rec_col)
    clen = _hdr(rec, "Content-Length").cast("int")
    body_at = F.locate(CRLF + CRLF, rec) + 4  # 1-based, after blank line
    body_chars = F.length(rec) - body_at - 4 + 1
    return df.select(
        _hdr(rec, "WARC-Type").alias("warc_type"),
        F.regexp_extract(rec, r"WARC-Record-ID: <([^>]+)>", 1)
         .alias("record_id"),
        _hdr(rec, "WARC-Date").alias("warc_date"),
        _hdr(rec, "WARC-Target-URI").alias("target_uri"),
        _hdr(rec, "Content-Type").alias("content_type"),
        clen.alias("content_length"),
        F.encode(rec.substr(body_at, body_chars), "UTF-8").alias("payload"),
    )


def _walk_warc(blob: bytes) -> list[tuple]:
    """Sequential record walk of one concatenated WARC file (bytes).

    A malformed record (non-numeric/negative Content-Length) is
    FLAGGED, not fatal: it becomes a ``warc_type='invalid'`` row with
    an empty payload and the walk resynchronizes at the next
    ``WARC/`` magic — mirroring the image path's decode_ok=false
    error channel instead of killing the whole mapInPandas task."""
    out, pos, n = [], 0, len(blob)
    while pos < n:
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = blob[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split(CRLF)[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        try:
            clen = int(fields.get("Content-Length", "0"))
            if clen < 0:
                raise ValueError("negative Content-Length")
        except ValueError:
            rid = fields.get("WARC-Record-ID", "")
            out.append(("invalid",
                        rid[1:-1] if rid.startswith("<") else rid,
                        fields.get("WARC-Date", ""),
                        fields.get("WARC-Target-URI", ""),
                        fields.get("Content-Type", ""),
                        -1, b""))
            nxt = blob.find(b"WARC/", hdr_end + 4)
            if nxt < 0:
                break
            pos = nxt
            continue
        body = blob[hdr_end + 4:hdr_end + 4 + clen]
        rid = fields.get("WARC-Record-ID", "")
        out.append((fields.get("WARC-Type", ""),
                    rid[1:-1] if rid.startswith("<") else rid,
                    fields.get("WARC-Date", ""),
                    fields.get("WARC-Target-URI", ""),
                    fields.get("Content-Type", ""),
                    clen, body))
        pos = hdr_end + 4 + clen + 4  # payload + trailing CRLF CRLF
    return out


def parse_warc_file_pandas(files: DataFrame,
                           blob_col: str = "file_bytes") -> DataFrame:
    """mapInPandas walker: one row per record across all file blobs.

    Binary-safe (image payloads pass through untouched); the per-blob
    loop is a handful of ``bytes.find`` hops per record — O(file size)
    with no decode — and each Arrow batch carries whole files, so this
    parallelizes by archive segment exactly like a distributed
    Common-Crawl read.
    """
    cols = ["warc_type", "record_id", "warc_date", "target_uri",
            "content_type", "content_length", "payload"]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf[blob_col]:
                rows.extend(_walk_warc(bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(walk, WARC_PARSED_SCHEMA)
