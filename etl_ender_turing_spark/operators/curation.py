"""End-to-end training-corpus curation: the composed pipeline that
actually ships data to a training run, built entirely from the engine's
certified single-purpose operators (quality gate → exact dedup →
benchmark decontamination → deterministic stratified mixture).

Every stage keeps its individual scale shape — the composition adds no
new shuffle beyond the stages' own:

1. quality gate        — narrow projection+filter (textstats columns);
2. exact dedup         — ONE shuffle on the content hash (uniform keys),
                         keep min-id per group via a hash-partitioned
                         window (row_number over md5 partitions);
3. decontamination     — benchmark n-grams are tiny by definition →
                         broadcast join against the corpus shingle
                         stream (never a corpus self-join);
4. stratified sampling — narrow deterministic hash filter, no shuffle,
                         no RNG (reproducible on any cluster).

The DuckDB oracle composes the SAME SQL fragments the single-op oracles
use, so a value-level hash match certifies the whole chain, not just the
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup as dd
from . import sampling as sp
from .textstats import quality_columns, quality_sql_columns


def prepare_training_set(docs: DataFrame, rates: dict[str, float],
                         default_rate: float = 0.0,
                         benchmark_max_id: int = 20,
                         min_tokens: int = 40, min_ttr: float = 0.3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """The full curation chain; returns (doc_id, source, n_tokens).

    ``benchmark_max_id``: docs below this id act as the held-out
    benchmark set — any surviving corpus doc sharing a word 5-gram with
    them is dropped (decontamination runs AFTER dedup so the n-gram pass
    scans each retained doc once).
    """
    q = quality_columns(text_col)
    gated = (docs.select(id_col, "source", text_col,
                         q["n_tokens"].alias("n_tokens"),
                         q["ttr"].alias("ttr"))
             .filter((F.col("n_tokens") >= min_tokens)
                     & (F.col("ttr") >= min_ttr)))
    w = Window.partitionBy(F.md5(F.lower(F.col(text_col)))) \
              .orderBy(F.col(id_col))
    deduped = (gated.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn", "ttr"))
    bench = docs.filter(F.col(id_col) < benchmark_max_id)
    contaminated = (dd.contaminated_docs(corpus=deduped, benchmark=bench,
                                         n=5, text_col=text_col,
                                         id_col=id_col)
                    .select(id_col))
    clean = deduped.join(contaminated, id_col, "left_anti")
    sampled = sp.stratified_sample(clean, rates, "source", id_col=id_col,
                                   default_rate=default_rate)
    return sampled.select(id_col, "source", "n_tokens")


def prepare_training_set_sql(table: str = "documents",
                             rates: dict[str, float] | None = None,
                             default_rate: float = 0.0,
                             benchmark_max_id: int = 20,
                             min_tokens: int = 40, min_ttr: float = 0.3,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    qs = quality_sql_columns(text_col)
    whens = " ".join(f"WHEN source = '{v}' THEN {r}"
                     for v, r in sorted((rates or {}).items()))
    # empty rates: a WHEN-less CASE is invalid SQL; the Python twin
    # (stratified_sample with rates={}) applies default_rate to every row
    rate_expr = (f"(CASE {whens} ELSE {default_rate} END)" if whens
                 else f"({default_rate})")
    bench_sh = dd.shingle_sql(
        f"(SELECT * FROM {table} WHERE {id_col} < {benchmark_max_id})",
        text_col, id_col, n=5)
    corp_sh = dd.shingle_sql("deduped", text_col, id_col, n=5)
    return f"""
    WITH gated AS (
      SELECT {id_col}, source, {text_col},
             {qs['n_tokens']} AS n_tokens
      FROM {table}
      WHERE {qs['n_tokens']} >= {min_tokens}
        AND {qs['ttr']} >= {min_ttr}
    ),
    deduped AS (
      SELECT * FROM gated
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(lower({text_col}))
                                 ORDER BY {id_col}) = 1
    ),
    bench_sh AS (SELECT DISTINCT shingle FROM ({bench_sh})),
    corp_sh AS ({corp_sh}),
    contaminated AS (
      SELECT DISTINCT corp_sh.{id_col}
      FROM corp_sh JOIN bench_sh USING (shingle)
    ),
    clean AS (
      SELECT * FROM deduped
      WHERE {id_col} NOT IN (SELECT {id_col} FROM contaminated)
    )
    SELECT {id_col}, source, n_tokens FROM clean
    WHERE {sp.hash_unit_sql(id_col)} < {rate_expr}
    """


def write_training_shards(df: DataFrame, path: str, n_shards: int = 16,
                          id_col: str = "doc_id") -> dict[int, int]:
    """Export the curated set as ``n_shards`` deterministic shards — the
    hand-off layout a pretraining loader consumes (shard = worker unit;
    within-shard order is the loader's concern).

    Shard assignment is md5(id) mod n_shards: stable under ANY cluster
    size, partition layout, or re-run (no RNG, no
    monotonically_increasing_id), so resumed/repeated exports place every
    doc in the same shard — the property that makes incremental re-export
    and on-disk dedup of shards possible. One shuffle (partitionBy write
    with one dir per shard); returns per-shard row counts.
    """
    import pyspark.sql.functions as F

    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                    16, 10).cast("long") % n_shards).alias("shard")
    sharded = df.withColumn("shard", shard)
    sharded.write.partitionBy("shard").mode("overwrite").parquet(path)
    out = sharded.groupBy("shard").count().collect()
    return {int(r["shard"]): r["count"] for r in out}
