"""Corpus term statistics: TF-IDF scoring and top-term extraction.

Extends the reference's per-document word counting
(ET-ETL-DWH-PY312/ETL/Transform.py words_count_* metrics) to
corpus-relative term weighting — the standard signal for keyword
extraction, near-topic clustering, and quality filtering in a
training-data pipeline.

Scale shape (100 TB):
- token explode is narrow (rows fan out, no shuffle);
- TF is one partial+final hash aggregation on (doc, term);
- DF reuses the TF result (a second, much smaller aggregation on term —
  vocabulary-sized, not corpus-sized);
- the corpus doc count rides a broadcast of a 1-row aggregate, not a
  driver-side ``.count()`` (keeps the whole thing one declarative plan);
- top-k per document is a window partitioned BY DOCUMENT — millions of
  small partitions, never a global sort.

Float parity with the oracle: a single ``ln`` + one ``round(·, 6)``
per output row, the same discipline as textstats ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _sql_term_list(query_terms: tuple[str, ...]) -> str:
    """Single-quoted SQL literal list with quotes doubled — oracle-SQL
    builders interpolate user-supplied terms, so a term containing ``'``
    must not break the statement (or inject into it)."""
    return ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    tfidf = tf · ln(N / df) over the lowercase whitespace token stream;
    ties broken by term (ascending) so results are deterministic and
    oracle-comparable. Output: (id, term, tf, tfidf).
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        " ")).alias("term")))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .join(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf") *
                                  F.log(F.col("n_docs") / F.col("df_")), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(id_col, "term", "tf", "tfidf"))


def tfidf_top_terms_sql(table: str, k: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(string_split(lower(trim({text_col})), ' ')) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
dfreq AS (
  SELECT term, count(*) AS df_ FROM tf GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT {id_col}, term, tf,
         ROUND(tf * ln(n_docs * 1.0 / df_), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT {id_col}, term, tf, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY {id_col}
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
WHERE rn <= {k}
"""


def bm25_topk(df: DataFrame, query_terms: tuple[str, ...], k: int = 5,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Lexical retrieval: top-``k`` documents per query term by BM25.

    The retrieval half of a curation loop (the ANN family in
    similarity.py is the dense half): given a handful of probe terms,
    rank documents by Okapi BM25 — idf · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf = ln(1 + (N-df+0.5)/(df+0.5)) (always positive, the
    Lucene/ATIRE form).

    Scale shape (100 TB):
    - ``dl`` (doc token length) is a narrow per-row ``size(split(...))``
      — no shuffle, no explode survives past the token filter;
    - the explode is filtered to the query terms BEFORE the tf
      aggregation, so the shuffled stream is |query_terms|-sparse, not
      corpus-sized;
    - ``df`` (document frequency) reuses the tf aggregate (query-term
      cardinality rows) and rides back as a broadcast;
    - corpus stats (N, avgdl) are a 1-row broadcast aggregate;
    - top-k is a window partitioned BY TERM — |query_terms| partitions
      of candidate postings, never a global sort.

    Float parity: ln + double division mirrored token-for-token in
    ``bm25_topk_sql``; one ROUND(·, 6) on the final score; ties broken
    by doc id. Parity caveat as tfidf: a last-ulp libm divergence would
    need a raw score within 5e-7 of a rounding boundary to surface.
    """
    base = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), " ").alias("_arr"))
    base = base.select(
        id_col,
        F.expr("size(filter(_arr, x -> x <> ''))").alias("dl"),
        "_arr")
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE)"
               " / COUNT(dl)").alias("avgdl"))
    tok = (base.select(id_col, "dl", F.explode("_arr").alias("term"))
           # Column API, not F.expr string-building: terms are user input
           # and must never be interpolated into an expression
           .filter(F.col("term").isin(*query_terms)))
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(F.broadcast(stats))
              .withColumn("bm25", F.round(
                  F.expr(f"ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))"
                         f" * tf * ({k1} + 1)"
                         f" / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))"),
                  6)))
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), F.asc(id_col))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("term", id_col, "tf", "dl", "bm25"))


def bm25_topk_sql(table: str, query_terms: tuple[str, ...], k: int = 5,
                  k1: float = 1.2, b: float = 0.75, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    terms_list = _sql_term_list(query_terms)
    return f"""
WITH base AS (
  SELECT {id_col},
         string_split(lower(trim({text_col})), ' ') AS arr
  FROM {table}
),
base2 AS (
  SELECT {id_col},
         len(list_filter(arr, x -> x <> '')) AS dl, arr
  FROM base
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / COUNT(dl) AS avgdl
  FROM base2
),
tok AS (
  SELECT {id_col}, dl, unnest(arr) AS term FROM base2
),
tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM tok WHERE term IN ({terms_list}) GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df_ FROM tf GROUP BY 1),
scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, tf.dl,
         ROUND(ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))
               * tf * ({k1} + 1)
               / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)), 6) AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT term, {id_col}, tf, dl, bm25
FROM (SELECT *, row_number() OVER (PARTITION BY term
                                   ORDER BY bm25 DESC, {id_col}) AS rn
      FROM scored)
WHERE rn <= {k}
"""


def hybrid_rrf_topk(docs: DataFrame, emb: DataFrame, term: str,
                    query_id: int, k: int = 10, c: int = 60,
                    doc_id_col: str = "doc_id",
                    vec_id_col: str = "vec_id") -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a sparse (BM25) and a
    dense (cosine top-k) candidate list — rrf = 1/(c+rank_sparse) +
    1/(c+rank_dense), absent list contributing 0 (Cormack et al. 2009).

    Rank-based fusion is exactly reproducible cross-engine: the only
    floats are 1/(c+r) for small integer r, identical IEEE doubles in
    any engine. Candidate ids join on the doc_id == vec_id convention
    (one embedding per document).

    Scale shape: both inputs are ALREADY top-k (k·2 rows total), so the
    fusion itself is a driver-trivial full-outer join + sort of ≤2k rows;
    all heavy lifting lives in the candidate generators, which keep their
    own scale shapes (BM25's filtered tf shuffle; TakeOrderedAndProject
    for the dense scan — swap in the IVF/LSH ANN for the 100 TB path).
    """
    from .similarity import brute_force_topk

    sparse = (bm25_topk(docs, (term,), k=k, id_col=doc_id_col)
              .withColumn("r_sparse", F.row_number().over(
                  Window.orderBy(F.desc("bm25"), F.asc(doc_id_col))))
              .select(F.col(doc_id_col).alias("id"), "r_sparse"))
    dense = (brute_force_topk(emb, query_id, k=k, id_col=vec_id_col)
             .select(F.col(vec_id_col).alias("id"),
                     F.col("rnk").alias("r_dense")))
    fused = (sparse.join(dense, "id", "full_outer")
             .withColumn("rrf", F.round(
                 F.coalesce(1.0 / (F.lit(c) + F.col("r_sparse")), F.lit(0.0))
                 + F.coalesce(1.0 / (F.lit(c) + F.col("r_dense")), F.lit(0.0)),
                 6)))
    w = Window.orderBy(F.desc("rrf"), F.asc("id"))
    return (fused.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("id", "rrf", "rnk"))


def hybrid_rrf_topk_sql(doc_table: str, emb_table: str, term: str,
                        query_id: int, k: int = 10, c: int = 60,
                        doc_id_col: str = "doc_id",
                        vec_id_col: str = "vec_id") -> str:
    from .similarity import brute_force_topk_sql

    bm25 = bm25_topk_sql(doc_table, (term,), k=k, id_col=doc_id_col)
    dense = brute_force_topk_sql(emb_table, query_id, k=k, id_col=vec_id_col)
    return f"""
WITH sparse AS (
  SELECT {doc_id_col} AS id,
         row_number() OVER (ORDER BY bm25 DESC, {doc_id_col}) AS r_sparse
  FROM ({bm25})
),
dense AS (
  SELECT {vec_id_col} AS id, rnk AS r_dense
  FROM ({dense})
),
fused AS (
  SELECT COALESCE(sparse.id, dense.id) AS id,
         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({c} + r_sparse), 0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({c} + r_dense), 0), 6) AS rrf
  FROM sparse FULL OUTER JOIN dense ON sparse.id = dense.id
)
SELECT id, rrf, rnk
FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, id) AS rnk FROM fused)
WHERE rnk <= {k}
"""


def build_text_index(df: DataFrame, table: str, n_buckets: int = 16,
                     text_col: str = "text", id_col: str = "doc_id",
                     path: str | None = None) -> None:
    """Materialize the BM25 inverted index: the (term, doc, tf, dl) posting
    table BUCKETED BY term, plus a 1-row corpus-stats table.

    The sparse dual of :func:`build_ivf_index`: build once, amortize over
    every query. Bucketing by term gives Spark BUCKET PRUNING on term
    equality/IN predicates — a query reads |query_terms| buckets out of
    ``n_buckets`` (``SelectedBucketsCount`` in the scan), never the whole
    posting list, and the posting build is the ONLY pass over the corpus
    text. At serving scale, ``n_buckets`` grows with the vocabulary.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), " ").alias("_arr"))
    base = base.select(
        id_col, F.expr("size(filter(_arr, x -> x <> ''))").alias("dl"),
        "_arr")
    tok = base.select(id_col, "dl", F.explode("_arr").alias("term")) \
              .filter(F.col("term") != "")
    tf = tok.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    w = (tf.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, "term").sortBy("term"))
    if path is not None:   # external table at an absolute location — keeps
        w = w.option("path", f"{path}/postings")   # the warehouse dir out of cwd
    w.saveAsTable(f"{table}_postings")
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE)"
               " / COUNT(dl)").alias("avgdl"))
    ws = stats.write.mode("overwrite").format("parquet")
    if path is not None:
        ws = ws.option("path", f"{path}/stats")
    ws.saveAsTable(f"{table}_stats")


def bm25_from_index(spark, table: str, query_terms: tuple[str, ...],
                    k: int = 5, k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id") -> DataFrame:
    """Serve BM25 top-k from a :func:`build_text_index` artifact.

    Touches only the postings buckets holding the query terms (bucket
    pruning) and the 1-row stats table; document frequency is an
    aggregation of the already-filtered postings. Result matches
    :func:`bm25_topk` exactly (parity-tested).
    """
    tf = (spark.table(f"{table}_postings")
          # isin prunes postings buckets exactly like the expr form did,
          # without interpolating user terms into an expression string
          .filter(F.col("term").isin(*query_terms)))
    stats = spark.table(f"{table}_stats")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(F.broadcast(stats))
              .withColumn("bm25", F.round(
                  F.expr(f"ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))"
                         f" * tf * ({k1} + 1)"
                         f" / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))"),
                  6)))
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), F.asc(id_col))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("term", id_col, "tf", "dl", "bm25"))


def zipf_slope(df: DataFrame, top_v: int = 200, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Zipf rank-frequency slope of the corpus: OLS fit of ln(freq) on
    ln(rank) over the ``top_v`` most frequent tokens — natural text sits
    near -1; template/boilerplate-heavy corpora flatten, random-token
    junk steepens. A one-row corpus-health diagnostic for curation runs.

    Scale shape: token counts are one partial+final agg (vocabulary-
    sized output); the top-v selection is an ordered limit
    (TakeOrderedAndProject: per-partition heap + driver merge of top_v
    rows) — the only window runs over exactly top_v rows AFTER the take,
    never over the vocabulary. Float parity: per-term ln products are
    6dp-floored and decimal-summed (order-independent); ties at the
    boundary break on the term string in both engines. round6u's FLOOR
    arithmetic is sign-agnostic cross-engine, so the (negative) slope
    stays bit-stable.
    """
    from ..functions.rounding import round6u

    tok = df.select(F.explode(F.expr(
        f"filter(split(lower(trim({text_col})), ' '), t -> t <> '')"))
        .alias("term"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = vocab.orderBy(F.desc("freq"), F.asc("term")).limit(top_v)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = top.withColumn("rank", F.row_number().over(w))

    def dsum6(expr: str) -> F.Column:
        return F.expr(f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5)"
                      f" / 1000000 AS DECIMAL(28,6))) AS DOUBLE)")

    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.max("freq").cast("long").alias("top_freq"),
        dsum6("ln(rank)").alias("sx"),
        dsum6("ln(freq)").alias("sy"),
        dsum6("ln(rank) * ln(freq)").alias("sxy"),
        dsum6("ln(rank) * ln(rank)").alias("sxx"))
    slope = ((F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return sums.select("n_terms", "top_freq",
                       round6u(slope).alias("zipf_slope"))


def zipf_slope_sql(table: str, top_v: int = 200, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    from ..functions.rounding import round6u_sql

    def dsum6(expr: str) -> str:
        return (f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5)"
                f" / 1000000 AS DECIMAL(28,6))) AS DOUBLE)")

    return f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(trim({text_col})), ' '),
                                t -> t <> '')) AS term
      FROM {table}
    ),
    vocab AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY 1),
    top AS (
      SELECT term, freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM vocab ORDER BY freq DESC, term LIMIT {top_v}
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(MAX(freq) AS BIGINT) AS top_freq,
             {dsum6("ln(rank)")} AS sx,
             {dsum6("ln(freq)")} AS sy,
             {dsum6("ln(rank) * ln(freq)")} AS sxy,
             {dsum6("ln(rank) * ln(rank)")} AS sxx
      FROM top
    )
    SELECT n_terms, top_freq,
           {round6u_sql("(n_terms * sxy - sx * sy)"
                        " / (n_terms * sxx - sx * sx)")} AS zipf_slope
    FROM s
    """


def class_tfidf_keywords(df: DataFrame, k: int = 5,
                         group_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per GROUP by class-based TF-IDF
    (c-TF-IDF, the BERTopic representation): treat each group's
    concatenated text as one document — wt = tf_in_group ·
    ln((1+n_groups)/(1+group_df)) — the corpus-exploration report that
    tells you WHAT each source/domain/cluster actually contains (and
    the first thing to read when a mixture weight looks wrong).

    Scale shape: one (group, term) aggregation over the token stream —
    group·vocab-bounded, uniform keys — then a vocab-scale group-df agg
    and a 1-row group count broadcast back; the per-group top-k window
    runs over group-vocab rows and is WindowGroupLimit-pruned. The ln
    is floor-quantized at 6dp (lm discipline) and multiplied by the
    exact integer tf — a single IEEE product, bit-identical
    cross-engine at ANY tf magnitude (no FLOOR on the product, which
    would overflow Spark's LONG-typed floor for corpus-scale tf).
    """
    toks = (df.select(F.col(group_col).alias("grp"),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        " ")).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    gdf = tf.groupBy("term").agg(F.count("*").alias("gdf"))
    # countDistinct skips NULL groups — matching COUNT(DISTINCT ..)
    # (a .distinct().count() would count the NULL row and diverge)
    ng = df.agg(F.countDistinct(group_col).alias("ng"))
    lnq = ("FLOOR(LN((1 + ng) * CAST(1 AS DOUBLE) / (1 + gdf))"
           " * 1000000 + 0.5) / 1000000")
    scored = (tf.join(gdf, "term").crossJoin(F.broadcast(ng))
              .withColumn("wt", F.col("tf") * F.expr(lnq)))
    w = Window.partitionBy("grp").orderBy(F.desc("wt"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("grp").alias(group_col), "term", "tf", "wt",
                    "rnk"))


def class_tfidf_keywords_sql(table: str, k: int = 5,
                             group_col: str = "source",
                             text_col: str = "text") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp,
         unnest(string_split(lower(trim({text_col})), ' ')) AS term
  FROM {table}
),
tf AS (
  SELECT grp, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY 1, 2
),
gdf AS (SELECT term, count(*) AS gdf FROM tf GROUP BY 1),
ng AS (SELECT count(DISTINCT {group_col}) AS ng FROM {table}),
scored AS (
  SELECT grp, term, tf,
         tf * (FLOOR(LN((1 + ng) * CAST(1 AS DOUBLE) / (1 + gdf))
                     * 1000000 + 0.5) / 1000000) AS wt
  FROM tf JOIN gdf USING (term) CROSS JOIN ng
)
SELECT grp AS {group_col}, term, tf, wt, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY wt DESC, term) AS rnk
      FROM scored)
WHERE rnk <= {k}
"""


def bm25_prf_topk(df: DataFrame, query_terms: tuple[str, ...],
                  k: int = 10, n_fb_docs: int = 5, n_fb_terms: int = 3,
                  k1: float = 1.2, b: float = 0.75,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Pseudo-relevance feedback retrieval (RM3 shape, Abdul-Jaleel et
    al. TREC 2004): BM25 round one → take the ``n_fb_docs`` best docs
    as silent relevance judgments → mine their ``n_fb_terms`` most
    informative terms (feedback frequency × idf, so corpus-common
    tokens don't expand the query) → re-rank with the expanded term
    set. The classic fix for vocabulary mismatch — a query for 'merge'
    also surfaces docs that only say 'upsert'.

    Scale shape: both rounds are the bm25_topk profile (query-sparse
    explode, broadcast df/stats, per-term windows); the only additions
    are one vocabulary-scale candidate-df aggregate (replication-flat)
    and a ``n_fb_terms``-row driver pull for the expansion terms — the
    centroid-collect discipline (the round-two plan needs them as
    literals). Determinism: every selection orders by (score, key).

    Output: (doc_id, score6) — the top-``k`` docs by summed
    6dp-rounded term scores, decimal-accumulated so the cross-engine
    sum is order-independent.
    """
    from ..functions.rounding import round6u

    def doc_scores(terms: tuple[str, ...]):
        base = df.select(
            F.col(id_col),
            F.split(F.lower(F.trim(F.col(text_col))), " ").alias("_arr"))
        base = base.select(
            id_col,
            F.expr("size(filter(_arr, x -> x <> ''))").alias("dl"),
            "_arr")
        stats = base.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE)"
                   " / COUNT(dl)").alias("avgdl"))
        tok = base.select(id_col, "dl", F.explode("_arr").alias("term")) \
            .filter(F.col("term") != "")
        tf = (tok.filter(F.col("term").isin(*terms))
              .groupBy(id_col, "term")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.min("dl").alias("dl")))
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
        scored = (tf.join(F.broadcast(dfreq), "term")
                  .join(F.broadcast(stats))
                  .withColumn("bm25", F.round(F.expr(
                      f"ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))"
                      f" * tf * ({k1} + 1)"
                      f" / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))"),
                      6)))
        per_doc = scored.groupBy(id_col).agg(F.expr(
            "CAST(SUM(CAST(bm25 AS DECIMAL(18,6))) AS DOUBLE)")
            .alias("score6"))
        return tok, stats, per_doc

    tok, stats, round1 = doc_scores(query_terms)
    fb = (round1.orderBy(F.desc("score6"), F.asc(id_col))
          .limit(n_fb_docs).select(id_col))
    cand = (tok.join(F.broadcast(fb), id_col)
            .filter(~F.col("term").isin(*query_terms))
            .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    cdf = tok.groupBy("term").agg(
        F.countDistinct(id_col).alias("df_"))
    picked = (cand.join(cdf, "term").crossJoin(F.broadcast(stats))
              .withColumn("w6", round6u(F.expr(
                  "cnt * ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))")))
              .orderBy(F.desc("w6"), F.asc("term"))
              .limit(n_fb_terms))
    expansion = tuple(r["term"] for r in picked.collect())
    _, _, round2 = doc_scores(tuple(query_terms) + expansion)
    return (round2.orderBy(F.desc("score6"), F.asc(id_col))
            .limit(k))


def bm25_prf_topk_sql(table: str, query_terms: tuple[str, ...],
                      k: int = 10, n_fb_docs: int = 5,
                      n_fb_terms: int = 3, k1: float = 1.2,
                      b: float = 0.75, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`bm25_prf_topk` — both rounds plus the
    expansion-term selection as chained CTEs (the oracle joins the
    term set; the Spark side pulls it as literals)."""
    from ..functions.rounding import round6u_sql
    qlist = _sql_term_list(query_terms)
    bm25 = (f"ROUND(ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))"
            f" * tf * ({k1} + 1)"
            f" / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)), 6)")
    w6 = round6u_sql("cnt * ln(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))")
    return f"""
    WITH lens AS (
      SELECT {id_col},
             list_filter(string_split(lower(trim({text_col})), ' '),
                         x -> x <> '') AS arr
      FROM {table}
    ),
    base AS (SELECT {id_col}, len(arr) AS dl, arr FROM lens),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(dl) AS avgdl FROM base),
    tok AS (SELECT {id_col}, dl, unnest(arr) AS term FROM base),
    tf1 AS (SELECT {id_col}, term, COUNT(*) AS tf, MIN(dl) AS dl
            FROM tok WHERE term IN ({qlist}) GROUP BY 1, 2),
    df1 AS (SELECT term, COUNT(*) AS df_ FROM tf1 GROUP BY 1),
    sc1 AS (SELECT {id_col}, {bm25} AS bm25
            FROM tf1 JOIN df1 USING (term) CROSS JOIN stats),
    r1 AS (SELECT {id_col},
                  CAST(SUM(CAST(bm25 AS DECIMAL(18,6))) AS DOUBLE) AS s
           FROM sc1 GROUP BY 1),
    fb AS (SELECT {id_col} FROM r1
           ORDER BY s DESC, {id_col} LIMIT {n_fb_docs}),
    cand AS (SELECT t.term, COUNT(*) AS cnt
             FROM tok t JOIN fb USING ({id_col})
             WHERE t.term NOT IN ({qlist}) GROUP BY 1),
    cdf AS (SELECT term, COUNT(DISTINCT {id_col}) AS df_
            FROM tok GROUP BY 1),
    exp AS (SELECT c.term FROM cand c JOIN cdf USING (term)
            CROSS JOIN stats
            ORDER BY {w6} DESC, c.term LIMIT {n_fb_terms}),
    terms2 AS (SELECT term FROM exp
               UNION SELECT unnest([{qlist}]) AS term),
    tf2 AS (SELECT t.{id_col}, t.term, COUNT(*) AS tf, MIN(t.dl) AS dl
            FROM tok t JOIN terms2 USING (term) GROUP BY 1, 2),
    df2 AS (SELECT term, COUNT(*) AS df_ FROM tf2 GROUP BY 1),
    sc2 AS (SELECT {id_col}, {bm25} AS bm25
            FROM tf2 JOIN df2 USING (term) CROSS JOIN stats),
    r2 AS (SELECT {id_col},
                  CAST(SUM(CAST(bm25 AS DECIMAL(18,6))) AS DOUBLE)
                  AS score6
           FROM sc2 GROUP BY 1)
    SELECT {id_col}, score6 FROM r2
    ORDER BY score6 DESC, {id_col} LIMIT {k}
    """
