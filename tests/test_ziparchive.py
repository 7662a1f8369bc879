"""ZIP archive source (sources/ziparchive.py): stdlib-writer roundtrip,
strict refusal contract, prefixed archives, Arrow-stage extraction."""

from __future__ import annotations

import io
import struct
import zipfile
import zlib

import pytest
from pyspark.sql import Row

from etl_ender_turing_spark.sources import ziparchive as za


def _zip(members, method=zipfile.ZIP_DEFLATED, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as zf:
        for n, d in members:
            zi = zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, d)
        if comment:
            zf.comment = comment
    return buf.getvalue()


def test_parse_roundtrips_stdlib_writer_both_methods():
    members = [("a.txt", b"hello world" * 10), ("b.bin", bytes(range(64)))]
    got = za.parse_zip_members(_zip(members))
    assert [(n, d) for n, d, _ in got] == members
    assert all(m == 8 for _, _, m in got)
    got0 = za.parse_zip_members(_zip(members, zipfile.ZIP_STORED))
    assert [(n, d) for n, d, _ in got0] == members
    assert all(m == 0 for _, _, m in got0)


def test_parse_handles_archive_comment_and_prefix():
    z = _zip([("x.txt", b"payload")], comment=b"trailing comment bytes")
    assert za.parse_zip_members(z)[0][1] == b"payload"
    # self-extracting stub / appended archive: offsets shift by prefix
    z2 = b"SFX-STUB" * 5 + _zip([("x.txt", b"payload")])
    assert za.parse_zip_members(z2)[0][1] == b"payload"


def test_parse_skips_directory_entries():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("d/", (1980, 1, 1, 0, 0, 0)), b"")
        zf.writestr(zipfile.ZipInfo("d/f.txt", (1980, 1, 1, 0, 0, 0)),
                    b"inner")
    got = za.parse_zip_members(buf.getvalue())
    assert [(n, d) for n, d, _ in got] == [("d/f.txt", b"inner")]


def test_parse_refusals():
    z = _zip([("x.txt", b"hello zip data")])
    with pytest.raises(ValueError):
        za.parse_zip_members(b"")
    with pytest.raises(ValueError):
        za.parse_zip_members(z[:-1])                 # truncated EOCD
    with pytest.raises(ValueError):
        za.parse_zip_members(z[len(z) // 2:])        # lost front half
    # bit-flip inside member data -> CRC mismatch
    body_at = z.index(b"x.txt") + 5
    bad = z[:body_at + 2] + bytes([z[body_at + 2] ^ 0xFF]) + z[body_at + 3:]
    with pytest.raises(ValueError):
        za.parse_zip_members(bad)
    # unsupported compression method in the central directory
    cd = z.index(b"PK\x01\x02")
    bad_m = z[:cd + 10] + struct.pack("<H", 99) + z[cd + 12:]
    with pytest.raises(ValueError):
        za.parse_zip_members(bad_m)
    # inflation-cap claim: usize beyond MAX_MEMBER_BYTES refuses
    big = struct.pack("<I", za.MAX_MEMBER_BYTES + 1)
    bad_u = z[:cd + 24] + big + z[cd + 28:]
    with pytest.raises(ValueError):
        za.parse_zip_members(bad_u)


def test_zip_bomb_inflation_refused():
    # a genuine bomb: 4 MiB of zeros deflates to ~4 KiB; cap the parser
    # lower via monkeypatching is invasive — instead verify the claimed
    # usize must match what actually inflates (lied size refuses)
    z = _zip([("z.bin", b"\0" * 1024)])
    cd = z.index(b"PK\x01\x02")
    lied = z[:cd + 24] + struct.pack("<I", 512) + z[cd + 28:]
    with pytest.raises(ValueError):
        za.parse_zip_members(lied)


def test_zip_members_stage_extracts_and_drops(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    good = za.synthesize_planted_zips(docs)
    rows = za.zip_members(good).collect()
    by_key = {(r.doc_id, r.member): r for r in rows}
    assert len(rows) == 12                       # two members per doc
    r3 = by_key[(3, "3.txt")]
    assert r3.method == 8 and r3.text == za._member_text(3)
    assert r3.n_bytes == len(za._member_text(3))
    r2 = by_key[(2, "2.json")]
    assert r2.method == 0 and r2.text == za._meta_text(2)
    # corrupt payloads drop silently (no task failure)
    bad = spark.createDataFrame(
        [Row(doc_id=99, payload=b"not a zip at all"),
         Row(doc_id=100, payload=None)])
    assert za.zip_members(bad).count() == 0


def test_crc_verification_is_real():
    """The reader recomputes CRC-32 over inflated bytes — a central
    directory claiming the wrong CRC refuses even when sizes check."""
    z = _zip([("x.txt", b"content here")], zipfile.ZIP_STORED)
    cd = z.index(b"PK\x01\x02")
    bad_crc = z[:cd + 16] + struct.pack(
        "<I", zlib.crc32(b"different") & 0xFFFFFFFF) + z[cd + 20:]
    with pytest.raises(ValueError):
        za.parse_zip_members(bad_crc)
