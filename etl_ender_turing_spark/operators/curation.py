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
from ..functions.barrier import lineage_cut

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


def prepare_llm_training_set(docs: DataFrame, k_raw: int = 200,
                             bpe_rounds: int = 2, train_mod: int = 5,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """The round-6 capstone composition — every stage a certified
    operator, chained the way a real LM-pretraining data pipeline runs:

    1. **LM perplexity gate** (`operators/lm.py`): train trigram counts
       on the trusted split, score every doc, drop each language's
       worst tercile (the CCNet recipe with a real LM, not a proxy);
    2. **DSIR selection** (`operators/dsir.py`): trusted survivors pass
       through; raw survivors keep only the ``k_raw`` most target-like
       by hashed-n-gram importance weight (disjoint sets by
       construction — DSIR scores only the raw pool);
    3. **exact dedup**: min-id per content hash, one uniform shuffle;
    4. **BPE token manifest** (`operators/bpe.py`): train ``bpe_rounds``
       merges on the final corpus and emit true token counts — the
       numbers a trainer budgets with.

    No stage adds a shuffle beyond its own certified shape. Stage
    outputs that feed MULTIPLE consumers (the gate's id list, the
    selection ids, the deduped corpus) are localCheckpointed: Spark has
    no cross-consumer common-subexpression elimination, so without the
    cut every consumer re-evaluates the whole upstream chain (measured
    27.6 s -> ~7 s at sf0.1; the LM-scoring subtree alone was being
    re-run ~12×). At 100 TB this is exactly stage materialization —
    production writes each stage to parquet; the checkpoint is the
    in-plan equivalent. Returns (id, lang, source, n_words, n_tokens).
    """
    from . import bpe
    from . import dsir
    from . import lm

    scores = lm.stupid_backoff_scores(
        docs, lm.train_ngram_counts(docs, train_mod, text_col, id_col),
        text_col, id_col)
    # the scored frame feeds TWO branches (the per-language tercile agg
    # and the keep filter): cut it so the corpus-scale LM scoring join
    # runs once — the counts cut inside stupid_backoff_scores dedups
    # TRAINING, but each consumer branch still re-ran the scoring join
    # (substep-profiled ~0.9 s per extra evaluation at sf0.1)
    sl = lineage_cut(scores.join(docs.select(id_col, "lang"), id_col))
    # upper-tercile threshold per language, the proven explicit
    # integer-index rule (see q_ccnet_buckets)
    th = (sl.groupBy("lang")
          .agg(F.sort_array(F.collect_list("mean_nll")).alias("l"))
          .select("lang",
                  F.expr("element_at(l, CAST((2 * size(l) + 2) div 3"
                         " AS INT))").alias("t2")))
    kept_ids = lineage_cut(
        sl.join(F.broadcast(th), "lang")
        .filter(F.col("mean_nll") < F.col("t2")).select(id_col))
    kept = docs.join(kept_ids, id_col)

    sel_ids = lineage_cut(
        kept.filter((F.col(id_col) % train_mod) == 0)
        .select(id_col)
        .unionByName(
            dsir.dsir_topk(kept, k=k_raw, train_mod=train_mod,
                           text_col=text_col, id_col=id_col)
            .select(id_col)))
    selected = kept.join(sel_ids, id_col)

    w = Window.partitionBy(F.md5(F.lower(F.col(text_col)))) \
              .orderBy(F.col(id_col))
    deduped = lineage_cut(
        selected.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn"))

    enc = bpe.bpe_encode_counts(deduped, rounds=bpe_rounds,
                                text_col=text_col, id_col=id_col)
    return deduped.select(id_col, "lang", "source").join(enc, id_col)


def prepare_llm_training_set_sql(table: str = "documents",
                                 k_raw: int = 200, bpe_rounds: int = 2,
                                 train_mod: int = 5,
                                 text_col: str = "text",
                                 id_col: str = "doc_id") -> str:
    """Composed DuckDB oracle: each stage's own generator, nested as an
    isolated WITH block, so the hash match certifies the chain."""
    from . import bpe
    from . import dsir
    from . import lm

    lm_sql = lm.stupid_backoff_scores_sql(table, train_mod, text_col,
                                          id_col)
    dsir_sql = dsir.dsir_topk_sql("kept", k=k_raw, train_mod=train_mod,
                                  text_col=text_col, id_col=id_col)
    enc_sql = bpe.bpe_encode_counts_sql("dedup2", rounds=bpe_rounds,
                                        text_col=text_col, id_col=id_col)
    return f"""
    WITH lmscores AS ({lm_sql}),
    sl AS (SELECT s.{id_col}, d.lang, s.mean_nll
           FROM lmscores s JOIN {table} d USING ({id_col})),
    th AS (SELECT lang, l[(2 * len(l) + 2) // 3] AS t2
           FROM (SELECT lang, list_sort(list(mean_nll)) AS l
                 FROM sl GROUP BY lang)),
    kept_ids AS (SELECT {id_col} FROM sl JOIN th USING (lang)
                 WHERE mean_nll < t2),
    kept AS (SELECT d.* FROM {table} d JOIN kept_ids USING ({id_col})),
    sel_raw AS ({dsir_sql}),
    sel_ids AS (SELECT {id_col} FROM kept WHERE {id_col} % {train_mod} = 0
                UNION ALL SELECT {id_col} FROM sel_raw),
    selected AS (SELECT k.* FROM kept k JOIN sel_ids USING ({id_col})),
    dedup2 AS (
      SELECT * FROM selected
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(lower({text_col}))
                                 ORDER BY {id_col}) = 1
    ),
    enc AS ({enc_sql})
    SELECT {id_col}, lang, source, n_words, n_tokens
    FROM dedup2 JOIN enc USING ({id_col})
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


def curation_attrition(docs: DataFrame, rates: dict[str, float],
                       default_rate: float = 0.0,
                       benchmark_max_id: int = 20,
                       min_tokens: int = 40, min_ttr: float = 0.3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-stage attrition report for the curation chain: one row per
    stage — (stage_idx, stage, docs_out, tokens_out) — the funnel a data
    team actually monitors in production (a dedup stage that suddenly
    drops 40 % instead of 4 % is an incident, and the only way to SEE it
    is stage-level counts on every run).

    Builds the same stage frames as :func:`prepare_training_set` (same
    gate/dedup/decontaminate/sample shapes, same helper builders) but
    every stage now has TWO consumers — the next stage and its own
    count — so each is ``localCheckpoint(eager=False)``-cut: Spark has
    no cross-consumer CSE, and without the cut stage N's aggregate
    re-evaluates the whole upstream chain (the measured 27.6 s → 8.6 s
    capstone lesson). At 100 TB this is exactly the stage
    materialization a production pipeline does anyway; the counts are
    one extra partial+final aggregate per stage over already-computed
    frames.
    """
    q = quality_columns(text_col)
    base = lineage_cut(
        docs.select(id_col, "source", text_col,
                    q["n_tokens"].alias("n_tokens"),
                    q["ttr"].alias("ttr")))
    gated = lineage_cut(
        base.filter((F.col("n_tokens") >= min_tokens)
                    & (F.col("ttr") >= min_ttr)))
    w = Window.partitionBy(F.md5(F.lower(F.col(text_col)))) \
              .orderBy(F.col(id_col))
    deduped = lineage_cut(
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn"))
    bench = docs.filter(F.col(id_col) < benchmark_max_id)
    contaminated = (dd.contaminated_docs(corpus=deduped, benchmark=bench,
                                         n=5, text_col=text_col,
                                         id_col=id_col)
                    .select(id_col))
    clean = lineage_cut(deduped.join(contaminated, id_col, "left_anti"))
    sampled = sp.stratified_sample(clean, rates, "source", id_col=id_col,
                                   default_rate=default_rate)

    def stage_row(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("docs_out"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long")
             .alias("tokens_out"))

    out = stage_row(base, 0, "raw")
    for i, (name, df) in enumerate(
            (("quality_gate", gated), ("exact_dedup", deduped),
             ("decontaminate", clean), ("stratified_sample", sampled)), 1):
        out = out.unionByName(stage_row(df, i, name))
    return out


def curation_attrition_sql(table: str = "documents",
                           rates: dict[str, float] | None = None,
                           default_rate: float = 0.0,
                           benchmark_max_id: int = 20,
                           min_tokens: int = 40, min_ttr: float = 0.3,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`curation_attrition`: the same stage CTEs
    as :func:`prepare_training_set_sql` (same quality/shingle/hash-unit
    fragment builders), certified through a UNION ALL of per-stage
    count/token aggregates."""
    qs = quality_sql_columns(text_col)
    whens = " ".join(f"WHEN source = '{v}' THEN {r}"
                     for v, r in sorted((rates or {}).items()))
    rate_expr = (f"(CASE {whens} ELSE {default_rate} END)" if whens
                 else f"({default_rate})")
    bench_sh = dd.shingle_sql(
        f"(SELECT * FROM {table} WHERE {id_col} < {benchmark_max_id})",
        text_col, id_col, n=5)
    corp_sh = dd.shingle_sql("deduped", text_col, id_col, n=5)
    stage = ("SELECT {i} AS stage_idx, '{n}' AS stage, "
             "CAST(COUNT(*) AS BIGINT) AS docs_out, "
             "CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS tokens_out "
             "FROM {f}")
    return f"""
    WITH base AS (
      SELECT {id_col}, source, {text_col},
             {qs['n_tokens']} AS n_tokens, {qs['ttr']} AS ttr
      FROM {table}
    ),
    gated AS (
      SELECT * FROM base
      WHERE n_tokens >= {min_tokens} AND ttr >= {min_ttr}
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
    ),
    sampled AS (
      SELECT * FROM clean
      WHERE {sp.hash_unit_sql(id_col)} < {rate_expr}
    )
    {stage.format(i=0, n='raw', f='base')}
    UNION ALL {stage.format(i=1, n='quality_gate', f='gated')}
    UNION ALL {stage.format(i=2, n='exact_dedup', f='deduped')}
    UNION ALL {stage.format(i=3, n='decontaminate', f='clean')}
    UNION ALL {stage.format(i=4, n='stratified_sample', f='sampled')}
    """


def shard_balance(df: DataFrame, n_shards: int = 16,
                  id_col: str = "doc_id") -> DataFrame:
    """One-row balance report for the :func:`write_training_shards`
    layout: (n_shards_used, n_docs, min_shard, max_shard, imbalance6) —
    the check a data team runs BEFORE a multi-hour export (a skewed
    shard is a straggler training worker; md5 assignment should keep
    max/mean within a few percent, and this report is how you notice
    when an id scheme breaks that).

    Same md5-mod assignment expression as the writer; one partial+final
    count per shard (≤ n_shards rows) then a 1-row reduce; imbalance =
    max/mean, 6dp-floored (the cross-engine ratio discipline).
    """
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                    16, 10).cast("long") % n_shards).alias("shard")
    per = df.select(shard).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.count(F.lit(1)).alias("n_shards_used"),
        F.sum("n").alias("n_docs"),
        F.min("n").alias("min_shard"),
        F.max("n").alias("max_shard"),
        F.expr(f"CAST(FLOOR(MAX(n) * {n_shards} * 1000000.0 / SUM(n) "
               "+ 0.5) / 1000000 AS DOUBLE)").alias("imbalance6"))


def shard_balance_sql(table: str = "documents", n_shards: int = 16,
                      id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`shard_balance` (same md5-mod)."""
    return f"""
    WITH per AS (
      SELECT ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))
               ::UBIGINT % {n_shards} AS shard,
             COUNT(*) AS n
      FROM {table} GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards_used,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(MIN(n) AS BIGINT) AS min_shard,
           CAST(MAX(n) AS BIGINT) AS max_shard,
           CAST(FLOOR(MAX(n) * {n_shards} * 1000000.0 / SUM(n) + 0.5)
             / 1000000 AS DOUBLE) AS imbalance6
    FROM per
    """


def prepare_multimodal_training_set(docs: DataFrame, min_tokens: int = 40,
                                    max_hamming: int = 3,
                                    text_col: str = "text",
                                    id_col: str = "doc_id") -> DataFrame:
    """Multimodal curation capstone: curate a corpus whose records carry
    text AND an image AND an audio clip — the shape of a
    vision/audio-language training set. Every stage is a certified
    single-modality operator, chained the way a production pipeline
    runs:

    1. **text quality gate** — narrow projection+filter (token floor);
    2. **image perceptual dedup** — 60-bit dHash over really-decoded
       planted images, pigeonhole-banded pairs, drop the larger id of
       every near-dup pair (keep-canonical);
    3. **acoustic dedup** — 63-bit energy-delta fingerprint over
       really-decoded PCM, same banding machinery, same keep rule;
    4. **manifest** — per-doc (lang, source, n_tokens, image_hash,
       audio_fp): the signatures ship WITH the corpus so downstream
       incremental dedup never re-decodes media.

    The composition adds no shuffle beyond the stages' own (the drop
    sets anti-join WITHOUT a broadcast hint — they are corpus-scale at
    real duplicate rates, AQE sizes them from observed bytes). Stage
    outputs feeding multiple consumers (the gated frame; each signature
    table serves its pair generator AND the final manifest join) are
    localCheckpointed — Spark has no cross-consumer CSE, and the decode
    stages are the expensive part. The DuckDB oracle composes the SAME
    SQL fragments the single-op oracles use (each as an isolated WITH
    block over the gated subset), so the hash match certifies the
    chain, not just the parts.
    """
    from . import multimodal as mm

    q = quality_columns(text_col)
    gated = lineage_cut(
        docs.select(id_col, "lang", "source",
                    q["n_tokens"].alias("n_tokens"))
        .filter(F.col("n_tokens") >= min_tokens))
    ids = gated.select(id_col)
    img = lineage_cut(mm.image_dhash(mm.synthesize_planted_pgm(ids)))
    aud = lineage_cut(
        mm.audio_fingerprint(mm.synthesize_planted_wav_pairs(ids)))
    img_drop = (dd.simhash_pairs(img, max_hamming=max_hamming)
                .select(F.col("doc_b").alias(id_col)).distinct())
    aud_drop = (dd.banded_hamming_pairs(aud, sig_col="fp", n_bands=4,
                                        band_bits=16,
                                        max_hamming=max_hamming)
                .select(F.col("doc_b").alias(id_col)).distinct())
    kept = (gated.join(img_drop, id_col, "left_anti")
            .join(aud_drop, id_col, "left_anti"))
    return (kept.join(img, id_col).join(aud, id_col)
            .select(id_col, "lang", "source", "n_tokens",
                    F.col("simhash").alias("image_hash"),
                    F.col("fp").alias("audio_fp")))


def prepare_multimodal_training_set_sql(table: str = "documents",
                                        min_tokens: int = 40,
                                        max_hamming: int = 3,
                                        text_col: str = "text",
                                        id_col: str = "doc_id") -> str:
    """Composed DuckDB oracle for
    :func:`prepare_multimodal_training_set`: the gate CTE plus each
    modality's own certified SQL generator over it, nested as isolated
    WITH blocks."""
    from . import multimodal as mm

    qs = quality_sql_columns(text_col)
    img_sql = mm.planted_pgm_dhash_sql("gated", id_col)
    img_pairs = mm.planted_pgm_neardup_sql("gated", max_hamming, id_col)
    aud_sql = mm.planted_wav_fp_sql("gated", id_col)
    aud_pairs = mm.planted_wav_neardup_sql("gated", max_hamming, id_col)
    return f"""
    WITH gated AS (
      SELECT {id_col}, lang, source, {qs['n_tokens']} AS n_tokens
      FROM {table}
      WHERE {qs['n_tokens']} >= {min_tokens}
    ),
    img AS ({img_sql}),
    img_pairs AS ({img_pairs}),
    aud AS ({aud_sql}),
    aud_pairs AS ({aud_pairs}),
    kept AS (
      SELECT g.* FROM gated g
      WHERE g.{id_col} NOT IN (SELECT doc_b FROM img_pairs)
        AND g.{id_col} NOT IN (SELECT doc_b FROM aud_pairs)
    )
    SELECT k.{id_col}, k.lang, k.source, k.n_tokens,
           i.simhash AS image_hash, a.fp AS audio_fp
    FROM kept k
    JOIN img i USING ({id_col})
    JOIN aud a USING ({id_col})
    """
