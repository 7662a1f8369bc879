"""Signed feature-hashing text embeddings (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning") — a DETERMINISTIC
text→vector operator with zero model dependencies, bridging the text
family to the ANN/similarity family: character n-grams hash into a
fixed-dimension signed count vector, L2-normalized; cosine over these
vectors is the classic hashing-trick similarity (the pre-neural
baseline fastText/Vowpal Wabbit built on, still the right tool when a
pipeline needs embeddings before any model exists).

Scale shape (100 TB): one narrow char-gram explode, one
(doc, dim-slot) hash aggregation — uniform keys, bounded fan-in of
``dim`` rows per doc — and a per-doc norm reduce. No model broadcast,
no Python. The sparse (doc_id, idx, w) output feeds the repo's
similarity machinery directly (sparse dot products join on idx).

Cross-engine exactness: slots and signs come from md5 (the repo's
deterministic-coin pattern); raw cell values are INTEGER sums of ±1;
the norm is sqrt of an integer (correctly-rounded IEEE in both
engines), the weight one double division, FLOOR-6dp-quantized
(sign-agnostic half-up — the repo-wide rule). Pairwise similarity
decimal-sums 12dp-quantized products, so it is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# slot + sign from one md5: first 8 hex chars -> slot, 9th hex digit
# parity -> ±1. ONE text per engine, same arithmetic.
_SLOT_SPARK = "CAST(conv(substring(md5(gram), 1, 8), 16, 10) AS BIGINT) % {dim}"
_SIGN_SPARK = ("CASE WHEN CAST(conv(substring(md5(gram), 9, 1), 16, 10)"
               " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END")
_SLOT_DUCK = "CAST(('0x' || substr(md5(gram), 1, 8))::UBIGINT AS BIGINT) % {dim}"
_SIGN_DUCK = ("CASE WHEN CAST(('0x' || substr(md5(gram), 9, 1))::UBIGINT"
              " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END")

# 6dp sign-agnostic half-up quantization of the normalized weight
_W6 = "FLOOR(CAST(raw AS DOUBLE) / nrm * 1000000 + 0.5) / 1000000"


def text_hash_embed(df: DataFrame, dim: int = 64, n: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, idx, w): L2-normalized signed-hash embedding, sparse rows
    (only touched slots emitted; docs shorter than ``n`` chars, or
    whose signs fully cancel, drop — both engines agree)."""
    grams = (df.select(F.col(id_col),
                       F.lower(F.trim(F.col(text_col))).alias("_s"))
             .filter(F.length("_s") >= n)
             .select(id_col, F.explode(F.expr(
                 f"transform(sequence(1, length(_s) - {n - 1}),"
                 f" i -> substring(_s, i, {n}))")).alias("gram")))
    cells = (grams.select(id_col,
                          F.expr(_SLOT_SPARK.format(dim=dim)).alias("idx"),
                          F.expr(_SIGN_SPARK).alias("sgn"))
             .groupBy(id_col, "idx")
             .agg(F.sum("sgn").cast("long").alias("raw")))
    norms = (cells.groupBy(id_col)
             .agg(F.expr("sqrt(CAST(SUM(raw * raw) AS DOUBLE))")
                  .alias("nrm")))
    return (cells.join(norms, id_col)
            .filter(F.col("nrm") > 0)
            .select(id_col, "idx", F.expr(_W6).alias("w")))


def text_hash_embed_sql(table: str = "documents", dim: int = 64,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB oracle — identical grams, hashes, norm and quantization."""
    return f"""
    WITH grams AS (
      SELECT {id_col},
             substring(_s, CAST(i AS INTEGER), {n}) AS gram
      FROM (SELECT {id_col}, lower(trim({text_col})) AS _s FROM {table}),
           LATERAL (SELECT unnest(generate_series(1, len(_s) - {n - 1}))
                    AS i) g
      WHERE len(_s) >= {n}
    ),
    cells AS (
      SELECT {id_col}, {_SLOT_DUCK.format(dim=dim)} AS idx,
             CAST(SUM({_SIGN_DUCK}) AS BIGINT) AS raw
      FROM grams GROUP BY 1, 2
    ),
    norms AS (
      SELECT {id_col}, sqrt(CAST(SUM(raw * raw) AS DOUBLE)) AS nrm
      FROM cells GROUP BY 1
    )
    SELECT c.{id_col}, c.idx, {_W6} AS w
    FROM cells c JOIN norms USING ({id_col})
    WHERE nrm > 0
    """


# 12dp-quantized product terms, decimal-summed -> order-independent,
# then 6dp-rounded similarity (values in [-1, 1]). Both engines and the
# Spark/SQL builders below share these templates so the quantization
# stays in one place.
_DOT = ("CAST(FLOOR({a} * {b} * 1000000000000 + 0.5) / 1000000000000"
        " AS DECIMAL(28,12))")
_SIM6 = ("FLOOR(CAST(SUM({term}) AS DOUBLE) * 1000000 + 0.5) / 1000000")


def hash_embed_neighbors(emb: DataFrame, query_id: int = 0, k: int = 10,
                         id_col: str = "doc_id") -> DataFrame:
    """Top-k cosine neighbors of one document under the hashed
    embeddings — sparse dot products joining on the slot index (the
    query side is a ≤``dim``-row broadcast), TakeOrderedAndProject
    top-k on (sim DESC, id). The zero-model text-similarity search."""
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col("idx").alias("qidx"), F.col("w").alias("qw"))
    dots = (emb.filter(F.col(id_col) != query_id).alias("a")
            .join(F.broadcast(q).alias("bq"),
                  F.col("a.idx") == F.col("bq.qidx"))
            .select(F.col(f"a.{id_col}").alias(id_col),
                    F.expr(_DOT.format(a="a.w", b="qw")).alias("term")))
    return (dots.groupBy(id_col)
            .agg(F.expr(_SIM6.format(term="term")).alias("sim"))
            .orderBy(F.desc("sim"), F.asc(id_col)).limit(k))


def hash_embed_neighbors_sql(table: str = "documents", query_id: int = 0,
                             k: int = 10, dim: int = 64, n: int = 3,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    emb = text_hash_embed_sql(table, dim, n, text_col, id_col)
    return f"""
    WITH emb AS ({emb}),
    dots AS (
      SELECT a.{id_col},
             {_DOT.format(a="a.w", b="q.w")} AS term
      FROM emb a JOIN (SELECT idx, w FROM emb
                       WHERE {id_col} = {query_id}) q USING (idx)
      WHERE a.{id_col} <> {query_id}
    )
    SELECT {id_col},
           {_SIM6.format(term="term")} AS sim
    FROM dots GROUP BY {id_col}
    ORDER BY sim DESC, {id_col} ASC LIMIT {k}
    """
