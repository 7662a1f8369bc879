"""WebDataset shard ingestion — tar archives of (image, caption) member
pairs, the de-facto layout multimodal training corpora ship in (LAION
and friends publish .tar shards whose members pair by stem:
``00001234.jpg`` + ``00001234.txt``).

Shape: a POSIX ustar archive is a concatenation of 512-byte headers +
512-padded member bodies, terminated by two zero blocks. Member size is
an OCTAL string at header offset 124 and the header carries a checksum
(byte sum with the checksum field read as spaces) the reader must
verify — like WARC's Content-Length walk, hopping by header-derived
sizes is the only correct traversal; splitting on anything is wrong
because member bodies are arbitrary binary.

Independence discipline: the planted BUILDER writes shards with stdlib
``tarfile`` (deterministic ustar: mtime 0, uid/gid 0); the query-side
READER is a hand-rolled offset walk that shares no code with it — a
builder/reader bug pair cannot cancel out, and the DuckDB oracle
regenerates every expected field (captions as string arithmetic, image
hashes from the md5 block-planting formula) without touching bytes.

Scale shape: one shard blob per input row (``binaryFile`` / blob column
at production), Arrow-batched parse, no shuffle until the user
aggregates — identical profile to :mod:`.warc`.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..operators.multimodal import (
    _JPG_BX, _JPG_BY, JPG_H, JPG_W, decode_image, dhash_int,
    encode_dc_only_jpeg)


def parse_tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    """REAL ustar walk with stdlib struct only: 512-byte headers, octal
    size field, checksum VERIFIED (sum of header bytes with the
    checksum field as spaces), 512-padded bodies, double-zero-block
    terminator. Returns [(name, bytes)] for regular members; raises
    ValueError on checksum mismatch, truncation, a missing
    double-zero-block terminator, a trailing partial header, or an
    empty archive (callers drop the row) — the walk is strict
    end-to-end, matching the size/checksum contract: an archive that
    ends mid-stream was truncated in flight, not \"done early\"."""
    b = payload
    out: list[tuple[str, bytes]] = []
    off = 0
    terminated = False
    while off + 512 <= len(b):
        hdr = b[off:off + 512]
        if hdr == b"\0" * 512:
            terminated = True
            break
        name = hdr[0:100].split(b"\0", 1)[0].decode("utf-8", "strict")
        size_field = hdr[124:136].split(b"\0")[0].strip()
        chks_field = hdr[148:156].split(b"\0")[0].strip()
        if not size_field or not chks_field:
            raise ValueError("malformed tar header fields")
        size = int(size_field, 8)
        chks = int(chks_field, 8)
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if calc != chks:
            raise ValueError("tar header checksum mismatch")
        data = b[off + 512:off + 512 + size]
        if len(data) != size:
            raise ValueError("truncated tar member")
        if hdr[156:157] in (b"0", b"\0"):
            out.append((name, data))
        off += 512 + ((size + 511) // 512) * 512
    if not terminated:
        if off < len(b):
            raise ValueError("trailing partial tar header")
        raise ValueError("archive ends without zero-block terminator")
    if not out:
        raise ValueError("no regular members in archive")
    return out


WDS_PAIR_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("caption", T.StringType()),
    T.StructField("simhash", T.LongType()),
])


def webdataset_pairs(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, caption, simhash): extract stem-paired ``.txt`` +
    ``.jpg`` members from each arriving shard, decode the caption and
    REALLY entropy-decode + dHash the image (the certified DC-only
    JPEG decoder and the image family's integer hash) — the record
    shape a contrastive/vision-language trainer consumes, with the
    perceptual signature attached at ingest so downstream image dedup
    never re-opens the shard. Members lacking their pair, unparseable
    shards, and undecodable images drop."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, caps, hs = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                b = (b"" if p is None else
                     (p if isinstance(p, (bytes, bytearray)) else bytes(p)))
                try:
                    members = parse_tar_members(b)
                except ValueError:
                    continue
                by_stem: dict[str, dict[str, bytes]] = {}
                for name, data in members:
                    stem, dot, ext = name.rpartition(".")
                    if dot:
                        by_stem.setdefault(stem, {})[ext] = data
                for stem in sorted(by_stem):
                    exts = by_stem[stem]
                    if "txt" not in exts or "jpg" not in exts:
                        continue
                    try:
                        sid = int(stem)
                        w, h, px = decode_image(exts["jpg"])
                    except (ValueError, NotImplementedError):
                        continue
                    ids.append(sid)
                    caps.append(exts["txt"].decode("utf-8", "replace"))
                    hs.append(dhash_int(w, h, px))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "caption": pd.Series(caps, dtype="object"),
                "simhash": pd.Series(hs, dtype="int64")})

    return df.mapInPandas(run, WDS_PAIR_SCHEMA)


def _planted_wds_block(did: int, bx: int, by: int) -> int:
    """Python spelling of the WebDataset image planting formula
    ('w:' salt — disjoint from the 'j:' still-JPEG and 'v:' video
    keys; no perturbation pairing, shards are independent samples)."""
    return int(hashlib.md5(f"w:{did}:{bx}:{by}".encode())
               .hexdigest()[:8], 16) % 180 + 20


def synthesize_planted_webdataset(docs: DataFrame,
                                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): VALID one-sample WebDataset shards — a ustar
    tar holding ``<id>.txt`` (deterministic caption) + ``<id>.jpg``
    (DC-only baseline JPEG with 'w:'-salted md5 block constants) —
    written with stdlib ``tarfile`` (deterministic: mtime 0, uid/gid 0),
    so the hand-rolled reader is validated against an independent
    writer. Arrow-batched and repartitioned first."""
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                # image content keys on id % 10M: a re-exported or
                # replicated shard (id offset by the 10M replication
                # span) carries an IDENTICAL image under a new sample
                # id — the dedup worst case, and the streaming gate's
                # planted positive. Base fixture ids are < 10M, so
                # base values are unchanged.
                content_key = did % 10_000_000
                dcs = [_planted_wds_block(content_key, bx, by) - 128
                       for by in range(_JPG_BY) for bx in range(_JPG_BX)]
                jpg = encode_dc_only_jpeg(JPG_W, JPG_H, dcs)
                txt = f"sample {did}".encode()
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w",
                                  format=tarfile.USTAR_FORMAT) as tf:
                    for name, data in ((f"{did}.txt", txt),
                                       (f"{did}.jpg", jpg)):
                        ti = tarfile.TarInfo(name)
                        ti.size = len(data)
                        ti.mtime = 0
                        tf.addfile(ti, io.BytesIO(data))
                ids.append(did)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "payload": payloads})

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return docs.select(id_col).mapInPandas(run, schema)


_WDS_V_DUCK = ("(CAST(('0x' || substr(md5('w:' || CAST({did} AS VARCHAR)"
               " || ':' || CAST({bx} AS VARCHAR) || ':'"
               " || CAST({by} AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
               " % 180 + 20)")


def planted_wds_pairs_sql(table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`webdataset_pairs` over the planted
    shards: captions as string arithmetic, image hashes from the
    'w:'-salted block constants (cells coincide with the 8×8 blocks) —
    never touching tar bytes, so a header-walk or pairing bug on the
    Spark side hash-mismatches."""
    v = _WDS_V_DUCK.format(did=id_col, bx="g.bx", by="g.by")
    return f"""
    WITH blocks AS (
      SELECT {id_col}, g.bx, g.by, {v} AS v
      FROM {table},
           LATERAL (SELECT unnest(generate_series(0,
                    {_JPG_BX * _JPG_BY - 1})) AS i) n,
           LATERAL (SELECT n.i % {_JPG_BX} AS bx, n.i // {_JPG_BX} AS by) g
    ),
    sigs AS (
      SELECT a.{id_col},
             CAST(SUM(CASE WHEN a.v > b.v
                      THEN CAST(pow(2, a.by * 10 + a.bx) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS simhash
      FROM blocks a JOIN blocks b
        ON a.{id_col} = b.{id_col} AND a.by = b.by AND b.bx = a.bx + 1
      WHERE a.bx < 10
      GROUP BY a.{id_col}
    )
    SELECT {id_col}, 'sample ' || CAST({id_col} AS VARCHAR) AS caption,
           simhash
    FROM sigs
    """


__all__ = ["parse_tar_members", "webdataset_pairs",
           "synthesize_planted_webdataset", "planted_wds_pairs_sql"]
