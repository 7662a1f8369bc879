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

The actual codec work (PIL/librosa/ffmpeg) is STUBBED: this container has
no media libraries. ``decode_stub`` raises NotImplementedError when asked
for a real decode and provides a deterministic fake (content-hash-derived
pseudo-features) so the Spark-side plumbing — schema, batching, UDF
signature — is fully real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

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


def decode_stub(payload: bytes, media_type: str, real: bool = False) -> dict:
    """Deterministic fake decode. ``real=True`` marks where PIL/librosa
    would be called — not available in this environment."""
    if real:
        raise NotImplementedError(
            "media decode requires PIL/librosa/ffmpeg; not in this container")
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
