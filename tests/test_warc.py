"""WARC framing: in-plan build/parse round-trips + binary file walk."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gigaspark.functions.png import decode_png, encode_png
from gigaspark.io.warc import (parse_warc_file_pandas, parse_warc_records,
                               warc_record_col)


def _build_record(rid: str, uri: str, mime: str, payload: bytes) -> bytes:
    head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <{rid}>\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def test_column_roundtrip_multibyte(spark):
    """Build → parse is identity, including multibyte UTF-8 payloads
    (Content-Length counts bytes; extraction is char-safe)."""
    rows = [(1, "snow ☃ and cjk 漢字"),
            (2, "plain ascii"),
            (3, "embedded WARC/1.0\r\nContent-Length: 9\r\n\r\n decoy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rec = warc_record_col(
        F.col("doc_id"), F.lit("2026-01-01T00:00:00Z"),
        F.concat(F.lit("http://d/"), F.col("doc_id").cast("string")),
        F.lit("text/plain"), F.col("text"))
    parsed = parse_warc_records(df.select(rec.alias("record")))
    got = {r["record_id"]: r for r in parsed.collect()}
    for doc_id, text in rows:
        r = got[f"urn:gigaspark:{doc_id}"]
        assert bytes(r["payload"]).decode() == text
        assert r["content_length"] == len(text.encode())
        assert r["target_uri"] == f"http://d/{doc_id}"
        assert r["warc_type"] == "response"


def test_file_walk_binary_png(spark):
    """Multi-record file with binary image payloads (one of them
    containing header-lookalike bytes) walks back intact."""
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    png = encode_png(pix)
    decoy = b"junk WARC/1.0\r\nContent-Length: 3\r\n\r\nxyz" * 3
    blob = (_build_record("urn:g:1", "http://a/1.png", "image/png", png)
            + _build_record("urn:g:2", "http://a/2.bin",
                            "application/octet-stream", decoy)
            + _build_record("urn:g:3", "http://a/3.png", "image/png", png))
    files = spark.createDataFrame([(blob,)], "file_bytes binary")
    rows = sorted(parse_warc_file_pandas(files).collect(),
                  key=lambda r: r["record_id"])
    assert [r["record_id"] for r in rows] == ["urn:g:1", "urn:g:2", "urn:g:3"]
    assert bytes(rows[1]["payload"]) == decoy
    for i in (0, 2):
        assert bytes(rows[i]["payload"]) == png
        assert np.array_equal(decode_png(bytes(rows[i]["payload"])), pix)
    assert [r["content_length"] for r in rows] == [len(png), len(decoy),
                                                   len(png)]


def test_file_walk_matches_column_parse(spark):
    """The pandas file walker and the Column record parser agree on the
    same text records."""
    df = spark.createDataFrame([(i, f"text payload {i}") for i in range(20)],
                               "doc_id long, text string")
    rec = warc_record_col(
        F.col("doc_id"), F.lit("2026-01-01T00:00:00Z"),
        F.concat(F.lit("http://d/"), F.col("doc_id").cast("string")),
        F.lit("text/plain"), F.col("text"))
    recs = df.select(rec.alias("record")).collect()
    blob = b"".join(r["record"].encode() for r in recs)
    via_file = parse_warc_file_pandas(
        spark.createDataFrame([(blob,)], "file_bytes binary"))
    via_col = parse_warc_records(df.select(rec.alias("record")))
    a = sorted([tuple(r) for r in via_file.collect()])
    b = sorted([tuple(r) for r in via_col.collect()])
    assert a == b


def test_file_walk_malformed_content_length(spark):
    """A record with a non-numeric Content-Length becomes a flagged
    warc_type='invalid' row (error channel) and the walk resyncs at
    the next WARC/ magic — good neighbours still parse."""
    good1 = _build_record("ok-1", "http://a/1", "text/plain", b"alpha")
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Record-ID: <bad-1>\r\n"
           b"Content-Length: oops\r\n\r\npayload junk ")
    good2 = _build_record("ok-2", "http://a/2", "text/plain", b"beta")
    blob = good1 + bad + good2
    df = spark.createDataFrame([(blob,)], "file_bytes binary")
    rows = {r["record_id"]: r
            for r in parse_warc_file_pandas(df).collect()}
    assert rows["bad-1"]["warc_type"] == "invalid"
    assert rows["bad-1"]["content_length"] == -1
    assert bytes(rows["ok-1"]["payload"]) == b"alpha"
    assert bytes(rows["ok-2"]["payload"]) == b"beta"


# -- resync-walk fuzz (VERDICT r4 item 8) -----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as hst

CRLF2 = b"\r\n\r\n"


def _mk_valid(i: int, payload: bytes) -> bytes:
    return (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:test:{i}>\r\n".encode()
            + b"WARC-Date: 2026-08-21T00:00:00Z\r\n"
            + f"WARC-Target-URI: http://h.example/{i}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + CRLF2)


def _mk_bad_clen(i: int, kind: str) -> bytes:
    clen = {"neg": b"-7", "nan": b"banana", "empty": b""}[kind]
    return (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:bad:{i}>\r\n".encode()
            + b"Content-Length: " + clen + CRLF2
            + b"shortbody" + CRLF2)


_ITEM = hst.one_of(
    hst.tuples(hst.just("valid"),
               hst.binary(min_size=0, max_size=40).filter(
                   lambda b: b"WARC/" not in b and CRLF2 not in b)),
    hst.tuples(hst.just("bad"), hst.sampled_from(["neg", "nan", "empty"])),
    hst.tuples(hst.just("trunc"), hst.just(b"WARC/1.0\r\nWARC-Type: resp")),
    hst.tuples(hst.just("huge"), hst.just(None)),
)


@given(hst.lists(_ITEM, min_size=1, max_size=12))
@settings(max_examples=300, deadline=None)
def test_walk_warc_fuzz_resync(items):
    """The file walker must never die and must lose only the records a
    malformed predecessor makes unrecoverable: after a parseable-but-
    invalid Content-Length (negative / non-numeric) the resync at the
    next WARC/ magic recovers everything; a truncated header swallows
    AT MOST the immediately following record; a huge Content-Length
    swallows the rest of the blob (bounded by construction — one blob).
    """
    from gigaspark.io.warc import _walk_warc

    blob = bytearray()
    recoverable: list[tuple[str, bytes]] = []
    invalid_expected = 0
    saw_huge = False
    prev_kind = None
    for idx, (kind, arg) in enumerate(items):
        if kind == "valid":
            blob += _mk_valid(idx, arg)
            if not saw_huge and prev_kind != "trunc":
                recoverable.append((f"http://h.example/{idx}", bytes(arg)))
        elif kind == "bad":
            blob += _mk_bad_clen(idx, arg)
            if not saw_huge and prev_kind != "trunc":
                invalid_expected += 1
        elif kind == "trunc":
            blob += arg
        else:  # huge Content-Length: swallows the remainder
            blob += (b"WARC/1.0\r\nWARC-Type: response\r\n"
                     b"Content-Length: 99999999999" + CRLF2)
            saw_huge = True
        prev_kind = kind if not saw_huge else "huge"

    rows = _walk_warc(bytes(blob))          # property 1: never raises
    got = {(r[3], r[6]) for r in rows if r[0] == "response"}
    for uri_payload in recoverable:         # property 2: bounded loss
        assert uri_payload in got, f"lost recoverable record {uri_payload}"
    n_invalid = sum(1 for r in rows if r[0] == "invalid")
    # property 3: every reachable bad record is flagged, none invented
    assert n_invalid >= invalid_expected
    assert n_invalid <= sum(1 for k, _ in items if k != "valid")
    # property 4: bounded output
    assert len(rows) <= len(items) + 2
