"""WebDataset shard ingestion: the hand-rolled ustar walk vs the stdlib
tarfile writer (independent implementations), pairing semantics, and
drop contracts."""

from __future__ import annotations

import io
import tarfile

import pytest

from etl_ender_turing_spark.operators import multimodal as mm
from etl_ender_turing_spark.sources import webdataset as wds


def _tar(members, fmt=tarfile.USTAR_FORMAT):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_parse_tar_members_roundtrips_stdlib_writer():
    members = [("a.txt", b"hello"), ("b.bin", bytes(range(200)) * 3),
               ("empty.txt", b"")]
    assert wds.parse_tar_members(_tar(members)) == members
    # member bodies are 512-padded; sizes must come from the octal
    # field, not the padding
    one = wds.parse_tar_members(_tar([("x.txt", b"y" * 513)]))
    assert one == [("x.txt", b"y" * 513)]


def test_parse_tar_members_refusals():
    good = _tar([("a.txt", b"hello")])
    # corrupt one payload byte INSIDE the header -> checksum mismatch
    bad = bytearray(good)
    bad[0] = ord("z")
    with pytest.raises(ValueError):
        wds.parse_tar_members(bytes(bad))
    # truncated member body (cut mid-payload, after a valid header)
    with pytest.raises(ValueError):
        wds.parse_tar_members(good[:514])
    # empty / non-tar payloads
    with pytest.raises(ValueError):
        wds.parse_tar_members(b"")
    with pytest.raises(ValueError):
        wds.parse_tar_members(b"\0" * 1024)


def test_webdataset_pairs_extracts_and_hashes(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    out = {r.doc_id: r for r in wds.webdataset_pairs(
        wds.synthesize_planted_webdataset(docs)).collect()}
    assert set(out) == {0, 1, 2, 3}
    for did, r in out.items():
        assert r.caption == f"sample {did}"
        # hash equals the independently-decoded planted image's dHash
        dcs = [wds._planted_wds_block(did, bx, by) - 128
               for by in range(mm._JPG_BY) for bx in range(mm._JPG_BX)]
        w, h, px = mm.decode_jpeg_gray(
            mm.encode_dc_only_jpeg(mm.JPG_W, mm.JPG_H, dcs))
        assert r.simhash == mm.dhash_int(w, h, px)


def test_webdataset_pairs_drops_unpaired_and_garbage(spark):
    rows = [
        (0, bytearray(_tar([("7.txt", b"no image")]))),   # missing .jpg
        (1, bytearray(b"not a tar")),                     # unparseable
        (2, None),                                        # NULL payload
        (3, bytearray(_tar([("9.txt", b"cap"),
                            ("9.jpg", b"not a jpeg")]))),  # bad image
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    assert wds.webdataset_pairs(df).count() == 0
