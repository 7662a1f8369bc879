"""WARC container parsing — the offset-walk semantics on hand-built
bytes (catalog-level oracle checks cover the planted fixture)."""

from __future__ import annotations

import hashlib

from etl_ender_turing_spark.sources import warc as wc


def _rec(uri: str, body: bytes, ctype: bytes = b"text/html") -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)
    return (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + uri.encode() + b"\r\nContent-Length: "
            + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n")


def test_warc_walk_is_offset_based_not_separator_based():
    # the first body CONTAINS a fake record boundary — a separator-split
    # parser would cut it in half; the Content-Length walk must not
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 9\r\n\r\nfake"
    chunk = _rec("https://a.com/1", evil) + _rec("https://b.com/2", b"ok")
    got = wc.parse_warc_chunk(7, chunk)
    assert [r["uri"] for r in got] == ["https://a.com/1",
                                      "https://b.com/2"]
    assert got[0]["n_body"] == len(evil)
    assert got[0]["body_md5"] == hashlib.md5(evil).hexdigest()
    assert got[0]["status"] == 200 and got[1]["n_body"] == 2
    assert all(r["chunk_id"] == 7 for r in got)


def test_warc_malformed_frame_stops_cleanly():
    ok = _rec("https://a.com/1", b"hello")
    # truncated second record: header promises more bytes than exist
    trunc = (b"WARC/1.0\r\nWARC-Target-URI: x\r\nContent-Length: 999"
             b"\r\n\r\nshort")
    got = wc.parse_warc_chunk(0, ok + trunc)
    assert len(got) == 1 and got[0]["uri"] == "https://a.com/1"
    # garbage prefix: nothing parsed, nothing raised
    assert wc.parse_warc_chunk(0, b"not a warc") == []
    assert wc.parse_warc_chunk(0, b"") == []


def test_warc_non_http_payload_degrades_to_null_status():
    raw = b"just bytes, not an HTTP message"
    rec = (b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "
           b"https://c.org/r\r\nContent-Length: "
           + str(len(raw)).encode() + b"\r\n\r\n" + raw + b"\r\n\r\n")
    (r,) = wc.parse_warc_chunk(1, rec)
    assert r["status"] is None and r["content_type"] is None
    assert r["n_body"] == len(raw)
    assert r["body_md5"] == hashlib.md5(raw).hexdigest()


def test_warc_roundtrip_multibyte_bodies(spark):
    # utf-8 multibyte text: Content-Length is BYTES, not chars — a
    # char-counting builder or parser would desync on the café row
    rows = [(0, "café ☃ snow"), (1, "plain"), (2, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = wc.synthesize_planted_warc(docs, per_chunk=2)
    got = {r.uri: (r.n_body, r.body_md5, r.chunk_id)
           for r in wc.parse_warc_records(chunks).collect()}
    assert len(got) == 3
    body0 = rows[0][1].encode("utf-8")
    assert got["https://example-0.com/page/0"] == (
        len(body0), hashlib.md5(body0).hexdigest(), 0)
    # NULL text plants an empty body, still a valid record
    assert got["https://example-2.com/page/2"][0] == 0


def test_gunzip_members_walks_concatenated_members():
    import gzip

    a, b = b"first record bytes", b"second \x1f\x8b inside"
    # member #2's PLAINTEXT contains the gzip magic: a magic-scanning
    # walk would misfire; the unused_data hop must not
    blob = gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)
    assert wc.gunzip_members(blob) == a + b
    assert wc.gunzip_members(b"") == b""
    import pytest
    with pytest.raises(ValueError):
        wc.gunzip_members(blob[:-5])            # truncated last member
    with pytest.raises(ValueError):
        wc.gunzip_members(b"\x1f\x8b not really gzip")


def test_warc_gz_roundtrips_and_drops_corrupt_chunks(spark):
    rows = [(0, "café ☃ snow"), (1, "plain"), (2, None), (3, "x" * 100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {(r.chunk_id, r.uri): (r.n_body, r.body_md5)
             for r in wc.parse_warc_records(
                 wc.synthesize_planted_warc(docs, per_chunk=2)).collect()}
    gz = {(r.chunk_id, r.uri): (r.n_body, r.body_md5)
          for r in wc.parse_warc_records(
              wc.synthesize_planted_warc_gz(docs, per_chunk=2)).collect()}
    # compression is transparent: identical parsed records
    assert gz == plain and len(gz) == 4
    # a corrupt member chain drops the WHOLE chunk, crashes nothing
    assert wc.parse_warc_chunk(9, b"\x1f\x8b garbage") == []
