"""Document shaping for training pipelines: sliding-window chunking and
fixed-token-budget sequence packing.

The reference's text layer stops at whole-document transforms (transcript
word counts, ET-ETL-DWH-PY312/ETL/Transform.py metrics); a training-data
pipeline additionally needs to cut documents into model-window-sized
chunks and pack short documents into dense fixed-size sequences. Both
operators here are designed for 100 TB:

- chunking is a narrow projection + one explode — no shuffle at any
  scale, and the chunk arithmetic (start offsets, slice bounds) is pure
  integer math so the DuckDB oracle hash-matches exactly;
- packing never forms a global order: documents are hash-sharded by a
  deterministic md5-derived key, and the running token sum that assigns
  sequence ids is computed per shard. The only shuffle is the shard
  exchange; each shard's window sorts ~1/n_shards of the data, so there
  is no single-reducer stage (the classic greedy packer is a sequential
  scan — this is its distributed, reproducible form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_SPACE = 2 ** 32


# --------------------------------------------------------------------------
# sliding-window chunking
# --------------------------------------------------------------------------

def chunk_documents(df: DataFrame, chunk_tokens: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cut each document's whitespace token stream into chunks of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    Output: (id, chunk_id, start, chunk_text, n_tokens) — the final chunk
    may be short (the trailing remainder is kept, never padded). One
    explode over per-row computed start offsets: chunk count ≈
    n_tokens/step rows out per row in, no shuffle introduced.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"{overlap=} {chunk_tokens=}")
    step = chunk_tokens - overlap
    return (df
            .select(F.col(id_col),
                    F.split(F.col(text_col), " ").alias("_t"))
            .select(id_col, "_t",
                    # explode must be a top-level generator (no cast around
                    # it); widen to long in the next projection instead
                    F.explode(F.expr(
                        f"sequence(0, greatest(size(_t) - 1, 0), {step})"))
                    .alias("start"))
            .select(id_col,
                    (F.col("start") / step).cast("long").alias("chunk_id"),
                    F.col("start").cast("long").alias("start"),
                    F.expr(f"array_join(slice(_t, start + 1, {chunk_tokens}),"
                           f" ' ')").alias("chunk_text"),
                    F.expr(f"size(slice(_t, start + 1, {chunk_tokens}))")
                    .cast("long").alias("n_tokens")))


def chunk_documents_sql(table: str, chunk_tokens: int = 64, overlap: int = 16,
                        text_col: str = "text", id_col: str = "doc_id",
                        where: str = "TRUE") -> str:
    """DuckDB rendering of :func:`chunk_documents` (same integer math;
    list slicing is 1-based inclusive in both engines' idioms here)."""
    step = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS toks
  FROM {table} WHERE {where}
)
SELECT {id_col},
       CAST(start // {step} AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS BIGINT)
         AS n_tokens
FROM t, UNNEST(generate_series(0, GREATEST(len(toks) - 1, 0), {step}))
       AS u(start)
"""


# --------------------------------------------------------------------------
# fixed-budget sequence packing
# --------------------------------------------------------------------------

def shard_key(id_col: str, n_shards: int):
    """Deterministic shard from md5(id) — layout-independent, identical
    in DuckDB (:func:`shard_key_sql`)."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long") % n_shards).alias("shard")


def shard_key_sql(id_col: str, n_shards: int) -> str:
    return (f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))"
            f"::UBIGINT % {n_shards} AS BIGINT)")


def pack_sequences(df: DataFrame, budget: int = 256, n_shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign each document to a training sequence of ~``budget`` tokens.

    Contiguous packing per shard: within a shard documents are laid out
    in id order and a document starts a new sequence when the running
    token total crosses a budget boundary (``seq = floor(preceding_total
    / budget)``). Deterministic — a pure function of (id set, budget,
    n_shards), independent of cluster layout.

    Scale: ONE hash-shard shuffle; the per-shard window sorts 1/n_shards
    of the rows in parallel (no global order, no single reducer). At
    100 TB raise ``n_shards`` to O(cluster cores); packing quality is
    unaffected since budget boundaries are per shard anyway.
    """
    d = (df.select(F.col(id_col),
                   F.size(F.split(F.col(text_col), " "))
                   .cast("long").alias("n_tokens"),
                   shard_key(id_col, n_shards)))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .select(id_col, "shard", "n_tokens", "cum_tokens",
                    ((F.col("cum_tokens") - F.col("n_tokens")) / budget)
                    .cast("long").alias("seq")))


def pack_sequences_sql(table: str, budget: int = 256, n_shards: int = 8,
                       text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH d AS (
  SELECT {id_col},
         CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens,
         {shard_key_sql(id_col, n_shards)} AS shard
  FROM {table}
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM d
)
SELECT {id_col}, shard, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - n_tokens) // {budget} AS BIGINT) AS seq
FROM c
"""


def pack_efficiency(df: DataFrame, budget: int = 256, n_shards: int = 8,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One-row packing-efficiency report over :func:`pack_sequences`:
    (n_docs, n_sequences, total_tokens, mean_seq_tokens, utilization) —
    the numbers a trainer budgets step counts and accelerator
    throughput with (utilization is the fraction of each sequence's
    ``budget`` slots actually filled; a doc that overruns its boundary
    spills into the same sequence, so utilization can exceed 1 — both
    regimes are real and the report is how you SEE which one you're in).

    Two aggregations past the packing projection itself: per-(shard,
    seq) token sums (uniform keys), then a single global reduce.
    Ratios go through the repo's round6u (small-integer ratios land on
    6dp halfway points; round(x, 6) is banned cross-engine)."""
    from ..functions.rounding import round6u

    packed = pack_sequences(df, budget, n_shards, text_col, id_col)
    per_seq = (packed.groupBy("shard", "seq")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("seq_tokens")))
    return (per_seq.agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("seq_tokens").alias("total_tokens"),
        round6u(F.sum("seq_tokens") / F.count(F.lit(1)))
        .alias("mean_seq_tokens"),
        round6u(F.sum("seq_tokens")
                / (F.count(F.lit(1)) * F.lit(budget)))
        .alias("utilization")))


def pack_efficiency_sql(table: str, budget: int = 256, n_shards: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    from ..functions.rounding import round6u_sql

    inner = pack_sequences_sql(table, budget, n_shards, text_col, id_col)
    return f"""
    WITH packed AS ({inner}),
    per_seq AS (
      SELECT shard, seq, COUNT(*) AS n_docs, SUM(n_tokens) AS seq_tokens
      FROM packed GROUP BY shard, seq
    )
    SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sequences,
           CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
           {round6u_sql("SUM(seq_tokens) * 1.0 / COUNT(*)")}
             AS mean_seq_tokens,
           {round6u_sql(f"SUM(seq_tokens) * 1.0 / (COUNT(*) * {budget})")}
             AS utilization
    FROM per_seq
    """
