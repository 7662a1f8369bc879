"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB):
- media payloads are `binary` columns with a typed metadata struct
  (media_type, codec, width/height or sample_rate, n_bytes) — never
  parsed on the JVM side;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole Arrow
  record batches in, so per-row Python overhead is amortized;
- partitioning guidance: media rows are large — repartition by
  ``n_bytes`` ranges (or bucket by content hash) before mapInPandas so
  batches have bounded memory, and keep
  spark.sql.execution.arrow.maxRecordsPerBatch small (media rows ≫
  normal rows).

Decode honesty split:
- HEADER METADATA (image width/height/bit-depth, audio sample-rate/
  channels/bits-per-sample) is decoded FOR REAL with stdlib ``struct``
  alone — PNG IHDR and WAV fmt-chunk parsing need no media library
  (:func:`parse_media_header`, :func:`extract_media_meta`).
- PIXEL/SAMPLE content work (resize, spectrogram, frame decode) is
  STUBBED: this container has no PIL/librosa/ffmpeg. ``decode_stub``
  raises NotImplementedError for content decode of unrecognized bytes
  and provides a deterministic fake (content-hash-derived
  pseudo-features) so the Spark-side plumbing — schema, batching, UDF
  signature — is fully real and testable.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),     # image | audio | video
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_mean", T.DoubleType()),      # fake feature
    T.StructField("byte_entropy_q", T.IntegerType()),  # fake feature
])


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_media_header(payload: bytes) -> dict | None:
    """REAL header-metadata decode with stdlib ``struct`` only.

    - PNG: the IHDR chunk is mandatory and first (PNG spec §11.2.1):
      width/height as big-endian u32 at bytes 16..24, bit depth at 24.
      CRC is not verified — this extracts metadata, it does not validate
      archives.
    - WAV: RIFF container scan for the ``fmt `` chunk (not assumed to be
      first — LIST/INFO chunks legally precede it): little-endian
      channels (u16), sample rate (u32), bits-per-sample (u16), honoring
      RIFF's odd-size pad byte.
    - JPEG: marker-segment scan from SOI to the first SOF frame header
      (baseline 0xC0 … lossless 0xC3, progressive 0xC2; APPn/DQT/DHT
      segments are skipped by their big-endian lengths, scan stops at
      SOS/EOI): precision (u8), height then width as big-endian u16s
      (JPEG stores HEIGHT first — the classic transposition bug the
      planted fixture would catch).

    Returns None for unrecognized bytes (caller falls back to the
    deterministic fake path / 'unknown' metadata).
    """
    b = payload
    if len(b) >= 26 and b[:8] == PNG_SIG and b[12:16] == b"IHDR":
        width, height = struct.unpack(">II", b[16:24])
        return {"media_type": "image", "codec": "png",
                "width": width, "height": height,
                "sample_rate": None, "channels": None, "bit_depth": b[24]}
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        off = 2
        while off + 2 <= len(b) and b[off] == 0xFF:
            # runs of 0xFF fill bytes may legally pad any marker
            # (ITU T.81 §B.1.1.2) — skip to the last 0xFF of the run
            while off + 2 <= len(b) and b[off + 1] == 0xFF:
                off += 1
            marker = b[off + 1]
            if marker in (0xD9, 0xDA) or marker == 0x00:
                break                        # EOI / SOS / stuffed-byte desync
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                off += 2                     # TEM / RSTn: standalone, no length
                continue
            if off + 4 > len(b):
                break
            (size,) = struct.unpack(">H", b[off + 2:off + 4])
            if 0xC0 <= marker <= 0xC3 and off + 9 <= len(b):
                precision = b[off + 4]
                height, width = struct.unpack(">HH", b[off + 5:off + 9])
                codec = {0xC0: "jpeg-baseline",
                         0xC2: "jpeg-progressive"}.get(marker, "jpeg")
                return {"media_type": "image", "codec": codec,
                        "width": width, "height": height,
                        "sample_rate": None, "channels": None,
                        "bit_depth": precision}
            off += 2 + size                  # length includes its 2 bytes
        return None
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        off = 12
        while off + 8 <= len(b):
            chunk_id = b[off:off + 4]
            (size,) = struct.unpack("<I", b[off + 4:off + 8])
            if chunk_id == b"fmt " and size >= 16 and off + 24 <= len(b):
                channels, sample_rate = struct.unpack(
                    "<HI", b[off + 10:off + 16])
                (bits,) = struct.unpack("<H", b[off + 22:off + 24])
                return {"media_type": "audio", "codec": "wav",
                        "width": None, "height": None,
                        "sample_rate": sample_rate, "channels": channels,
                        "bit_depth": bits}
            off += 8 + size + (size & 1)   # chunks are word-aligned
    return None


def decode_stub(payload: bytes, media_type: str, real: bool = False) -> dict:
    """Deterministic fake CONTENT decode. ``real=True`` first tries the
    stdlib header parse (:func:`parse_media_header`); pixel/sample work
    on unrecognized bytes still needs PIL/librosa/ffmpeg and raises."""
    if real:
        meta = parse_media_header(payload)
        if meta is not None:
            return {**meta, "n_bytes": len(payload)}
        raise NotImplementedError(
            "content decode of unrecognized media requires "
            "PIL/librosa/ffmpeg; not in this container")
    n = len(payload)
    s = sum(payload[:256])
    return {
        "n_bytes": n,
        "byte_mean": (s / min(n, 256)) if n else 0.0,
        "byte_entropy_q": (s % 17),
    }


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      media_type: str = "image") -> DataFrame:
    """Typed metadata struct derived JVM-side (no Python) where possible."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake/raw").alias("codec"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes")))


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas stage is the template for any real decoder: swap
    ``decode_stub`` for the codec call; schema/batching stay identical.
    """
    mt_col = "media_meta"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payloads (failed fetch, pruned column) degrade to
            # empty-payload features, never crash the batch
            feats = [decode_stub(b"" if p is None else
                                 (p if isinstance(p, (bytes, bytearray))
                                  else bytes(p)),
                                 (m or {}).get("media_type", "unknown"))
                     for p, m in zip(pdf[payload_col], pdf[mt_col])]
            media_types = [(m or {}).get("media_type", "unknown")
                           for m in pdf[mt_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": media_types,
                "n_bytes": [f["n_bytes"] for f in feats],
                "byte_mean": [f["byte_mean"] for f in feats],
                "byte_entropy_q": [f["byte_entropy_q"] for f in feats],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


MEDIA_HEADER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

_UNKNOWN_META = {"media_type": "unknown", "codec": None, "width": None,
                 "height": None, "sample_rate": None, "channels": None,
                 "bit_depth": None}


def extract_media_meta(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "doc_id") -> DataFrame:
    """REAL header-metadata extraction over binary payloads — the same
    Arrow-batched ``mapInPandas`` shape as :func:`extract_features`, but
    the decode is :func:`parse_media_header` (stdlib struct), not a fake.
    Unrecognized bytes degrade to media_type='unknown', never crash."""
    cols = [f.name for f in MEDIA_HEADER_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                b = (b"" if p is None else
                     (p if isinstance(p, (bytes, bytearray)) else bytes(p)))
                meta = parse_media_header(b) or _UNKNOWN_META
                rows.append({"doc_id": int(did), **meta, "n_bytes": len(b)})
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, MEDIA_HEADER_SCHEMA)


def _hex_be(col: Column, n_bytes: int) -> Column:
    """Fixed-width big-endian hex of a non-negative integral column."""
    return F.lpad(F.lower(F.hex(col.cast("bigint"))), 2 * n_bytes, "0")


def _hex_le(col: Column, n_bytes: int) -> Column:
    """Little-endian byte order: the big-endian hex with bytes reversed."""
    h = _hex_be(col, n_bytes)
    return F.concat(*[F.substring(h, 2 * i + 1, 2)
                      for i in reversed(range(n_bytes))])


def synthesize_planted_media(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID media headers planted from doc_id — the
    oracle-checkable fixture for :func:`extract_media_meta`.

    Even ids are images (width = id%512+16, height = id%256+16, 8-bit):
    id%4==2 a PNG signature + IHDR chunk; id%4==0 a JPEG — SOI, a real
    JFIF APP0 segment (so the parser must SKIP a segment to reach the
    frame header), then SOF0 (or SOF2 when id%8==0 → progressive) with
    height-before-width per the JPEG spec, then EOI. Odd ids a
    RIFF/WAVE header with a 16-byte PCM fmt chunk (sample_rate = 8000 +
    (id%5)*8000, channels = 1 + (id/2)%2, 16-bit). All byte-assembly is
    JVM-side hex/unhex — the Python side only ever PARSES, so a
    struct-unpack bug cannot cancel itself out against the builder.
    """
    did = F.col(id_col)
    w, h = did % 512 + 16, did % 256 + 16
    png = F.concat(
        F.lit("89504e470d0a1a0a"),            # PNG signature
        F.lit("0000000d49484452"),            # IHDR length 13 + type
        _hex_be(w, 4), _hex_be(h, 4),
        F.lit("0802000000"),                  # bit depth 8, RGB, no interlace
        F.lit("00000000"))                    # CRC (not verified)
    jpg = F.concat(
        F.lit("ffd8"),                                   # SOI
        F.lit("ffe000104a46494600010100000100010000"),   # APP0/JFIF, len 16
        F.when(did % 8 == 0, F.lit("ffc2")).otherwise(F.lit("ffc0")),
        F.lit("001108"),                      # SOF length 17, precision 8
        _hex_be(h, 2), _hex_be(w, 2),         # HEIGHT first (JPEG spec)
        F.lit("03011100021101031101"),        # 3 YCbCr component specs
        F.lit("ffd9"))                        # EOI
    sr = F.lit(8000) + (did % 5) * 8000
    ch = F.lit(1) + (did / F.lit(2)).cast("bigint") % 2
    wav = F.concat(
        F.lit("52494646"), _hex_le(F.lit(36), 4), F.lit("57415645"),  # RIFF
        F.lit("666d7420"), _hex_le(F.lit(16), 4),                     # fmt
        _hex_le(F.lit(1), 2), _hex_le(ch, 2),                # PCM, channels
        _hex_le(sr, 4), _hex_le(sr * ch * 2, 4),             # rate, byterate
        _hex_le(ch * 2, 2), _hex_le(F.lit(16), 2))           # align, bits
    return docs.select(
        id_col,
        F.unhex(F.when(did % 4 == 2, png)
                 .when(did % 2 == 0, jpg)
                 .otherwise(wav)).alias("payload"))


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture: payload =
    utf-8 bytes of text. Keeps every pipeline stage runnable in-container."""
    return attach_media_meta(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload")))


def frame_sample(df: DataFrame, every_n_bytes: int = 64,
                 payload_col: str = "payload") -> DataFrame:
    """'Frame sampling' on the fake payload: slice every Nth byte-window —
    JVM-side substring math, the shape of real video frame-sampling where
    the decode itself would be the mapInPandas stage above."""
    return df.withColumn(
        "frames",
        F.expr(f"transform(sequence(1, greatest(1, length({payload_col}) div {every_n_bytes})),"
               f" i -> substring({payload_col}, (i - 1) * {every_n_bytes} + 1, {every_n_bytes}))"))
