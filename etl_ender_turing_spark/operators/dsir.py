"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score raw-pool documents by how target-like their
hashed n-gram distribution is, then keep the top of the pool.

The published recipe: featurize every document as counts over hashed
unigrams+bigrams (a fixed bucket space B), fit two smoothed bag-of-
buckets models — one on the trusted/target split, one on the raw pool —
and weight each raw document by its log importance ratio
``sum_positions lambda_bucket`` where
``lambda_b = ln p_target(b) - ln p_raw(b)`` (Laplace-smoothed).
Resampling then keeps the highest-weight documents. The trusted split
here is ``doc_id % train_mod == 0``, the same stand-in the n-gram LM
(`operators/lm.py`) uses for CCNet's Wikipedia partition.

Scale shape (100 TB):
- Featurization is a narrow explode (tokens bound in a projection
  first — no HOF-lambda re-evaluation), hashed into a FIXED bucket
  space: the model is B rows no matter the corpus size.
- Training is ONE conditional aggregation over the exploded features
  (partial+final count per bucket, target and raw in the same pass) —
  no second scan for the raw model.
- Scoring broadcasts the B-row lambda table (always tiny) against the
  exploded features and reduces per doc: exactly one wide stage.
- Selection is ``ORDER BY w DESC LIMIT k`` — Spark's
  TakeOrderedAndProject (per-partition heads, never a global sort).

Cross-engine exactness: bucket ids come from the md5 prefix trick shared
with `operators/sampling.py` (identical in both engines); each
``lambda_b`` is 6dp-floored once in the B-row model table, and per-doc
weights are decimal sums of those quantized terms — the same contract as
`lm.stupid_backoff_scores`, so a last-ulp ``ln`` divergence cannot reach
the driver hash.

Reference parity note: the reference engine has no data-selection
operator — this family belongs to the training-data-pipeline mandate
(SURVEY.md §6), alongside dedup/quality/sampling/LM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.barrier import lineage_cut

from .lm import _TOK_DUCK, _TOK_SPARK

# Smoothed log importance ratio for one bucket, over the trained counts
# (t_cnt target hits, r_cnt raw hits, tt/rt the split totals, B the
# bucket-space size). Laplace +1 with B pseudo-buckets keeps every
# bucket finite in both models. Valid verbatim in BOTH dialects; the
# parenthesized order fixes the IEEE sequence, and the 6dp floor-half-up
# quantizes the one ln-dependent value before it ever multiplies out.
_LAM = ("FLOOR((ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(tt + {b} AS DOUBLE))"
        " - ln(CAST(r_cnt + 1 AS DOUBLE) / CAST(rt + {b} AS DOUBLE)))"
        " * 1000000 + 0.5) / 1000000")


def _features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bucket-input gram) — exploded unigram+bigram features.
    Tokens are bound as a real column BEFORE the explode so the
    split/filter runs once per row, not once per element.

    Shape (r12): one INTEGER positional explode over 2·|t|−1 slots
    (positions ≤ |t| are unigrams, the rest bigrams) with the gram
    assembled in a plain codegen projection — the previous
    concat(t, transform(sequence, i -> concat_ws(...))) built a per-row
    string array through interpreted HOF lambdas (same finding as the
    PassJoin probe melt; multiset proven identical, 0.57 → 0.44 s with
    bucketing at sf0.1)."""
    toks = df.select(F.col(id_col),
                     F.expr(_TOK_SPARK.format(col=text_col)).alias("t"))
    return (toks.filter(F.size("t") >= 1)
            .select(id_col, "t",
                    F.expr("explode(sequence(1, 2 * size(t) - 1))")
                    .alias("_i"))
            .select(id_col, F.expr(
                "CASE WHEN _i <= size(t) THEN element_at(t, _i)"
                " ELSE concat_ws(' ', element_at(t, _i - size(t)),"
                " element_at(t, _i - size(t) + 1)) END").alias("gram")))


def _bucket(gram_col: str, n_buckets: int) -> F.Column:
    """md5-prefix hash bucket — the cross-engine-stable feature hash
    (same construction as sampling.hash_unit)."""
    return (F.conv(F.substring(F.md5(F.col(gram_col)), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def _train_counts(f: DataFrame) -> DataFrame:
    """(bucket, t_cnt, r_cnt, tt, rt) from an exploded (bucket, tgt)
    feature frame — the one conditional partial+final aggregation both
    the persistable-model builder and dsir_weights' inline-train path
    share (totals ride a 1-row broadcast cross join), so the smoothing
    and bucket scheme cannot drift between the two."""
    agg = (f.groupBy("bucket")
           .agg(F.sum(F.when(F.col("tgt"), 1).otherwise(0))
                .alias("t_cnt"),
                F.sum(F.when(~F.col("tgt"), 1).otherwise(0))
                .alias("r_cnt")))
    tot = agg.agg(F.sum("t_cnt").alias("tt"),
                  F.sum("r_cnt").alias("rt"))
    return agg.crossJoin(F.broadcast(tot))


def dsir_bucket_model(df: DataFrame, n_buckets: int = 1024,
                      train_mod: int = 5, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Train the B-row DSIR model: per-bucket target/raw counts and the
    smoothed, 6dp-quantized log importance ratio ``lam``.

    One pass: conditional sums split target vs raw inside a single
    partial+final aggregation; totals ride a 1-row broadcast cross join.
    Returns (bucket, t_cnt, r_cnt, lam) — the persistable artifact.
    """
    f = (_features(df, text_col, id_col)
         .select(_bucket("gram", n_buckets).alias("bucket"),
                 ((F.col(id_col) % train_mod) == 0).alias("tgt")))
    return (_train_counts(f)
            .select("bucket", F.col("t_cnt").cast("long").alias("t_cnt"),
                    F.col("r_cnt").cast("long").alias("r_cnt"),
                    F.expr(_LAM.format(b=n_buckets)).alias("lam")))


def dsir_weights(df: DataFrame, n_buckets: int = 1024, train_mod: int = 5,
                 text_col: str = "text", id_col: str = "doc_id",
                 model: DataFrame | None = None) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    Each feature position joins the broadcast B-row model and the doc
    reduces to ``logw = decimal-sum(lam)`` — positions with the same
    bucket contribute cnt copies of the identical quantized term, so
    no second pre-aggregation is needed (one explode, one broadcast
    join, ONE shuffle: the per-doc reduce). Documents with no tokens
    produce no positions and drop out (both engines agree).

    Returns (id, n_feats, logw) for the raw pool
    (``id % train_mod != 0``). Pass a persisted ``model`` to score a
    new pool against an existing target distribution.
    """
    if model is None:
        # inline-train path: model AND scoring read the same exploded
        # feature positions — materialize them ONCE (id, bucket, tgt)
        # behind a checkpoint barrier instead of running the explode +
        # digest pass twice (train over all docs, score over raw).
        # At 100 TB the persisted artifact is the B-row MODEL (the
        # ``model`` argument path); inside one inline query the
        # position table is the cheaper thing to hold than to recompute.
        fa = lineage_cut(
            _features(df, text_col, id_col)
            .select(id_col, _bucket("gram", n_buckets).alias("bucket"),
                    ((F.col(id_col) % train_mod) == 0).alias("tgt")))
        model = (_train_counts(fa.select("bucket", "tgt"))
                 .select("bucket",
                         F.expr(_LAM.format(b=n_buckets)).alias("lam")))
        feats = fa.filter(~F.col("tgt")).select(id_col, "bucket")
    else:
        raw = df.filter((F.col(id_col) % train_mod) != 0)
        feats = (_features(raw, text_col, id_col)
                 .select(id_col,
                         _bucket("gram", n_buckets).alias("bucket")))
    return (feats
            .join(F.broadcast(model.select("bucket", "lam")), "bucket")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_feats"),
                 F.expr("CAST(SUM(CAST(lam AS DECIMAL(28,6))) AS DOUBLE)")
                 .alias("logw")))


def dsir_topk(df: DataFrame, k: int = 100, n_buckets: int = 1024,
              train_mod: int = 5, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """The resampling step, deterministic variant: keep the ``k``
    highest-weight raw documents (weight desc, id asc — a total order).
    ORDER BY + LIMIT compiles to TakeOrderedAndProject: per-partition
    top-k heaps merged on the driver, never a global sort shuffle."""
    w = dsir_weights(df, n_buckets, train_mod, text_col, id_col)
    return (w.orderBy(F.desc("logw"), F.asc(id_col))
            .limit(k)
            .select(id_col, "logw"))


# --------------------------------------------------------------------------
# DuckDB oracles — same tokenizer, same md5 buckets, same _LAM snippet
# --------------------------------------------------------------------------

def _features_sql(table: str, n_buckets: int, text_col: str,
                  id_col: str, train_mod: int) -> str:
    """CTE body: exploded (id, bucket, tgt) features + the trained
    B-row model with quantized lam."""
    tok = _TOK_DUCK.format(col=text_col)
    lam = _LAM.format(b=n_buckets)
    return f"""
    WITH _tok AS (SELECT {id_col}, {tok} AS t FROM {table}),
    feats AS (
      SELECT {id_col},
             (('0x' || substr(md5(g), 1, 8))::UBIGINT % {n_buckets})
               AS bucket,
             {id_col} % {train_mod} = 0 AS tgt
      FROM (SELECT {id_col}, unnest(list_concat(t,
                     list_transform(generate_series(2, len(t)),
                                    i -> t[i - 1] || ' ' || t[i]))) AS g
            FROM _tok)
    ),
    agg AS (SELECT bucket,
                   SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_cnt,
                   SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS r_cnt
            FROM feats GROUP BY 1),
    tot AS (SELECT SUM(t_cnt) AS tt, SUM(r_cnt) AS rt FROM agg),
    model AS (SELECT bucket, CAST(t_cnt AS BIGINT) AS t_cnt,
                     CAST(r_cnt AS BIGINT) AS r_cnt, {lam} AS lam
              FROM agg CROSS JOIN tot),
    weights AS (
      SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM(CAST(lam AS DECIMAL(28,6))) AS DOUBLE) AS logw
      FROM feats JOIN model USING (bucket)
      WHERE NOT tgt
      GROUP BY {id_col}
    )
    """


def dsir_bucket_model_sql(table: str, n_buckets: int = 1024,
                          train_mod: int = 5, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    return (_features_sql(table, n_buckets, text_col, id_col, train_mod)
            + "\n    SELECT bucket, t_cnt, r_cnt, lam FROM model")


def dsir_weights_sql(table: str, n_buckets: int = 1024, train_mod: int = 5,
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    return (_features_sql(table, n_buckets, text_col, id_col, train_mod)
            + f"\n    SELECT {id_col}, n_feats, logw FROM weights")


def dsir_topk_sql(table: str, k: int = 100, n_buckets: int = 1024,
                  train_mod: int = 5, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    return (_features_sql(table, n_buckets, text_col, id_col, train_mod)
            + f"""
    SELECT {id_col}, logw FROM weights
    ORDER BY logw DESC, {id_col} ASC LIMIT {k}""")
