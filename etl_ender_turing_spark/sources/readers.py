"""Source readers.

The reference's sources are paginated REST scans (reference:
ET-ETL-DWH-PY312/ETL/Extract.py:23-64 sessions; 207-250 dimensions). In this
engine, batch sources are parquet/json scans — Catalyst pushes predicates
and prunes columns into them automatically — and the API-scan shape lives in
``api_source.py`` as a parallel, partition-per-interval reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")


# Timestamp-type contract (FIXTURES.md): driver testdata has shipped
# events.ts as TIMESTAMP(NANOS) (round 1) and plain timestamp[us] →
# TIMESTAMP_NTZ (round 2+). Readers branch on the OBSERVED schema, never a
# pinned assumption: nano longs (via nanosAsLong) are converted to
# micros-precision timestamps, truncating exactly like DuckDB/Arrow do;
# micros files pass through untouched (the isinstance check no-ops).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-contained: any vanilla SparkSession must be able to read a
    # nano-timestamp parquet, not just sessions built by our own get_spark()
    # factory. The conf is runtime-settable and harmless for micros files,
    # so pin it here as a compatibility fallback.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # integer `div`, NOT `/`: epoch-nanos exceed double's 53-bit
            # mantissa, so float division is off by ±1µs.
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


# Ingestion formats for landing EXTERNAL data (the warehouse's own tables
# stay parquet). tsv/jsonl are spellings of csv/json; text reads one line
# per row (raw-corpus ingestion).
_EXT_FMT = {".parquet": "parquet", ".orc": "orc", ".json": "json",
            ".jsonl": "json", ".csv": "csv", ".tsv": "tsv", ".txt": "text"}


def read_any(spark: SparkSession, path: str, fmt: str | None = None,
             schema: T.StructType | str | None = None,
             **options) -> DataFrame:
    """Land external data in any supported batch format — parquet, ORC,
    json/jsonl, csv/tsv, raw text — with the format inferred from the
    file extension when not given.

    Scale contract: pass an explicit ``schema`` for csv/json at any real
    size — schema inference is a SECOND full pass over the data before
    the real scan (inferSchema is only defaulted on when no schema is
    supplied, as a small-file convenience). Predicate pushdown and column
    pruning reach parquet and ORC scans; csv/json prune columns but
    filter post-parse.
    """
    import os

    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        if ext not in _EXT_FMT:
            raise ValueError(
                f"cannot infer format from {path!r}; pass fmt= explicitly")
        fmt = _EXT_FMT[ext]
    fmt = fmt.lower()
    if fmt == "jsonl":
        fmt = "json"
    if fmt == "tsv":
        fmt = "csv"
        options.setdefault("sep", "\t")
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).format(fmt).load(path)
