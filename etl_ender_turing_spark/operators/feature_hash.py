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
# parity -> ±1. ONE text per engine, same arithmetic (the Spark side
# binds md5 once as a column and uses the _SLOT_H/_SIGN_H spellings).
_SLOT_DUCK = "CAST(('0x' || substr(md5(gram), 1, 8))::UBIGINT AS BIGINT) % {dim}"
_SIGN_DUCK = ("CASE WHEN CAST(('0x' || substr(md5(gram), 9, 1))::UBIGINT"
              " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END")

# 6dp sign-agnostic half-up quantization of the normalized weight
_W6 = "FLOOR(CAST(raw AS DOUBLE) / nrm * 1000000 + 0.5) / 1000000"

# slot/sign over a pre-bound md5 column (the Spark builders bind
# ``md5(gram)`` ONCE in a projection and derive both from it — one
# digest per gram instead of two; the SQL templates above stay the
# oracle spelling)
_SLOT_H = "CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT) % {dim}"
_SIGN_H = ("CASE WHEN CAST(conv(substring(h, 9, 1), 16, 10)"
           " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END")


def _char_grams(df: DataFrame, key_col: str, s_col: str,
                n: int) -> DataFrame:
    """(key, gram): the char n-grams of ``s_col`` — one integer
    ``explode(sequence(...))`` with the substring taken in a plain
    projection. The previous ``transform(sequence, i -> substring)``
    lambda built a per-row string array interpreted (HOF lambdas get no
    whole-stage codegen); this shape keeps the explode integer-only and
    the string work codegen'd (guide §1.2 step 2 / the r12 PassJoin
    finding)."""
    cols = [key_col] if key_col == s_col else [key_col, s_col]
    return (df.filter(F.length(s_col) >= n)
            .select(*cols,
                    F.expr(f"explode(sequence(1, length({s_col})"
                           f" - {n - 1}))").alias("_i"))
            .select(key_col,
                    F.expr(f"substring({s_col}, _i, {n})").alias("gram")))


def text_hash_embed(df: DataFrame, dim: int = 64, n: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, idx, w): L2-normalized signed-hash embedding, sparse rows
    (only touched slots emitted; docs shorter than ``n`` chars, or
    whose signs fully cancel, drop — both engines agree)."""
    grams = _char_grams(
        df.select(F.col(id_col),
                  F.lower(F.trim(F.col(text_col))).alias("_s")),
        id_col, "_s", n)
    cells = (grams.select(id_col, F.md5("gram").alias("h"))
             .select(id_col,
                     F.expr(_SLOT_H.format(dim=dim)).alias("idx"),
                     F.expr(_SIGN_H).alias("sgn"))
             .groupBy(id_col, "idx")
             .agg(F.sum("sgn").cast("long").alias("raw")))
    # norm as a WINDOW over cells, not a groupBy + self-join: the join
    # form evaluated the whole gram/digest/agg subtree twice (2 scans, 2
    # Generates, no exchange reuse — r12 plan audit); the window reads
    # cells once, groups are dim-bounded (<= dim rows per doc), and one
    # hash exchange replaces an exchange + join (guide §2.4)
    return (cells.withColumn(
                "nrm", F.expr("sqrt(CAST(SUM(raw * raw) OVER"
                              f" (PARTITION BY {id_col}) AS DOUBLE))"))
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


def hash_embed_query_topk(df: DataFrame, query_text: str, k: int = 10,
                          dim: int = 64, n: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Top-k cosine docs for a FREE-TEXT query under the hashed doc
    embeddings: the query string runs through the identical
    text_hash_embed pipeline (one 1-row frame → ≤``dim``-row
    broadcast), sparse slot-join dot products, TakeOrderedAndProject.
    The exact whole-doc baseline the late-interaction recall row
    (q_li_recall_check) measures MaxSim against."""
    spark = df.sparkSession
    emb = text_hash_embed(df, dim, n, text_col, id_col)
    qdf = spark.createDataFrame([(0, query_text)],
                                f"_qid long, {text_col} string")
    qemb = (text_hash_embed(qdf, dim, n, text_col, "_qid")
            .select(F.col("idx").alias("qidx"), F.col("w").alias("qw")))
    dots = (emb.alias("a")
            .join(F.broadcast(qemb).alias("bq"),
                  F.col("a.idx") == F.col("bq.qidx"))
            .select(F.col(f"a.{id_col}").alias(id_col),
                    F.expr(_DOT.format(a="a.w", b="qw")).alias("term")))
    return (dots.groupBy(id_col)
            .agg(F.expr(_SIM6.format(term="term")).alias("sim"))
            .orderBy(F.desc("sim"), F.asc(id_col)).limit(k))


def hash_embed_query_topk_sql(table: str = "documents",
                              query_text: str = "", k: int = 10,
                              dim: int = 64, n: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    demb = text_hash_embed_sql(table, dim, n, text_col, id_col)
    esc = query_text.replace("'", "''")
    qemb = text_hash_embed_sql(f"(SELECT 0 AS _qid, '{esc}' AS qtext)",
                               dim, n, "qtext", "_qid")
    return f"""
    WITH demb AS ({demb}),
    qemb AS (SELECT idx, w AS qw FROM ({qemb})),
    dots AS (
      SELECT a.{id_col}, {_DOT.format(a="a.w", b="q.qw")} AS term
      FROM demb a JOIN qemb q USING (idx)
    )
    SELECT {id_col}, {_SIM6.format(term="term")} AS sim
    FROM dots GROUP BY {id_col}
    ORDER BY sim DESC, {id_col} ASC LIMIT {k}
    """


def _token_embed(toks: DataFrame, dim: int, n: int,
                 tok_col: str = "tok") -> DataFrame:
    """(tok, idx, w): the text_hash_embed pipeline applied to a DISTINCT
    token vocabulary — char-grams of the token string, signed-hash
    cells, L2 norm, 6dp quantization. Identical arithmetic to the
    doc-level embed, so the SQL templates are shared."""
    grams = _char_grams(toks, tok_col, tok_col, n)
    cells = (grams.select(tok_col, F.md5("gram").alias("h"))
             .select(tok_col,
                     F.expr(_SLOT_H.format(dim=dim)).alias("idx"),
                     F.expr(_SIGN_H).alias("sgn"))
             .groupBy(tok_col, "idx")
             .agg(F.sum("sgn").cast("long").alias("raw")))
    # same one-pass window-norm shape as text_hash_embed
    return (cells.withColumn(
                "nrm", F.expr("sqrt(CAST(SUM(raw * raw) OVER"
                              f" (PARTITION BY {tok_col}) AS DOUBLE))"))
            .filter(F.col("nrm") > 0)
            .select(tok_col, "idx", F.expr(_W6).alias("w")))


def late_interaction_topk(df: DataFrame, query_terms: tuple[str, ...],
                          k: int = 10, dim: int = 64, n: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """ColBERT-style LATE-INTERACTION retrieval with zero-model token
    embeddings: score(doc) = Σ over query terms of MAX over the doc's
    tokens of cos(term, token) — per-term soft matching that beats
    whole-doc cosine on multi-aspect queries (Khattab & Zaharia 2020,
    re-expressed on the hashing-trick embeddings so no model ships).

    Scale shape — the reason this is tractable at 100 TB: token
    embeddings are computed on the DISTINCT token VOCABULARY
    (replication-flat, the BPE/unigram trainer argument), the
    query-side is a ≤|terms|·dim-row broadcast, and the only
    corpus-scale shuffles are the distinct (doc, token) projection and
    the final (doc, term) max aggregation — the doc × token-embedding
    join keys on the token string (uniform, vocabulary-bounded fan-in).

    CANDIDATE SEMANTICS: a (term, token) pair contributes only if the
    two share ≥ 1 hash slot (the sparse join); a term matching no token
    of a doc contributes 0 — exactly the inverted-index pruning real
    late-interaction serving does. Per-(doc, term) maxima quantize to
    BIGINT micro-units before the final integer sum, so the score is
    order-independent cross-engine. Output: (doc_id, score_micro),
    top-k by (score DESC, id) — TakeOrderedAndProject, no global sort.
    """
    spark = df.sparkSession
    doc_toks = (df.select(F.col(id_col),
                          F.explode(F.split(F.lower(F.trim(
                              F.col(text_col))), r"\s+")).alias("tok"))
                .filter(F.col("tok") != "")
                .distinct())
    vocab = doc_toks.select("tok").distinct()
    temb = _token_embed(vocab, dim, n)
    qdf = spark.createDataFrame([(t,) for t in query_terms], "qterm string")
    qemb = (_token_embed(qdf.select(F.lower(F.col("qterm")).alias("tok")),
                         dim, n)
            .select(F.col("tok").alias("qterm"), "idx",
                    F.col("w").alias("qw")))
    sims = (temb.join(F.broadcast(qemb), "idx")
            .select("tok", "qterm",
                    F.expr(_DOT.format(a="w", b="qw")).alias("term"))
            .groupBy("tok", "qterm")
            .agg(F.expr(_SIM6.format(term="term")).alias("sim")))
    per_term = (doc_toks.join(sims, "tok")
                .groupBy(id_col, "qterm")
                .agg(F.expr("CAST(FLOOR(MAX(sim) * 1000000 + 0.5)"
                            " AS BIGINT)").alias("m")))
    return (per_term.groupBy(id_col)
            .agg(F.sum("m").cast("long").alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k))


def build_li_index(df: DataFrame, table: str, n_buckets: int = 16,
                   dim: int = 64, n: int = 3, text_col: str = "text",
                   id_col: str = "doc_id",
                   path: str | None = None) -> None:
    """Materialize the late-interaction serving index: the distinct
    (doc, token) projection and the vocabulary token embeddings, both
    BUCKETED BY token — the dense-ish dual of :func:`terms.
    build_text_index` (r11 VERDICT #3: give late interaction the same
    build-once/serve-many treatment the BM25 path got).

    Build is the ONLY pass over corpus text; serving
    (:func:`late_interaction_from_index`) never re-tokenizes or
    re-embeds the corpus. Bucketing both tables by ``tok`` makes the
    serve-side aggregations ride the bucket partitioning (the
    vocabulary-sims groupBy needs no exchange) and keeps the doc-token
    scan join-ready. At 100 TB the doc-token table is the big artifact
    (corpus-scale, 2 columns); the vocabulary embedding is
    vocabulary-scale — the same replication-flat argument as the
    BPE/unigram trainers."""
    spark = df.sparkSession
    doc_toks = (df.select(F.col(id_col),
                          F.explode(F.split(F.lower(F.trim(
                              F.col(text_col))), r"\s+")).alias("tok"))
                .filter(F.col("tok") != "")
                .distinct())
    w = (doc_toks.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, "tok").sortBy("tok"))
    if path is not None:
        w = w.option("path", f"{path}/doc_toks")
    w.saveAsTable(f"{table}_doc_toks")
    # vocabulary re-read from the persisted doc-token table, so the
    # text pipeline runs exactly once end-to-end
    vocab = spark.table(f"{table}_doc_toks").select("tok").distinct()
    temb = _token_embed(vocab, dim, n)
    wv = (temb.write.mode("overwrite").format("parquet")
          .bucketBy(n_buckets, "tok").sortBy("tok"))
    if path is not None:
        wv = wv.option("path", f"{path}/vocab_emb")
    wv.saveAsTable(f"{table}_vocab_emb")


def late_interaction_from_index(spark, table: str,
                                query_terms: tuple[str, ...],
                                k: int = 10, dim: int = 64, n: int = 3,
                                id_col: str = "doc_id") -> DataFrame:
    """Serve late-interaction top-k from a :func:`build_li_index`
    artifact: embed the query terms (a ≤|terms|·dim-row pipeline over
    literals), sparse-slot join against the PERSISTED vocabulary
    embeddings (the groupBy rides the tok bucketing — no exchange),
    broadcast the vocabulary-bounded (tok, term, sim) table into the
    persisted doc-token scan, and aggregate. Zero corpus-text work at
    serve time; result matches :func:`late_interaction_topk` exactly
    (certified against the same oracle)."""
    qdf = spark.createDataFrame([(t,) for t in query_terms],
                                "qterm string")
    qemb = (_token_embed(qdf.select(F.lower(F.col("qterm")).alias("tok")),
                         dim, n)
            .select(F.col("tok").alias("qterm"), "idx",
                    F.col("w").alias("qw")))
    temb = spark.table(f"{table}_vocab_emb")
    sims = (temb.join(F.broadcast(qemb), "idx")
            .select("tok", "qterm",
                    F.expr(_DOT.format(a="w", b="qw")).alias("term"))
            .groupBy("tok", "qterm")
            .agg(F.expr(_SIM6.format(term="term")).alias("sim")))
    per_term = (spark.table(f"{table}_doc_toks")
                .join(F.broadcast(sims), "tok")
                .groupBy(id_col, "qterm")
                .agg(F.expr("CAST(FLOOR(MAX(sim) * 1000000 + 0.5)"
                            " AS BIGINT)").alias("m")))
    return (per_term.groupBy(id_col)
            .agg(F.sum("m").cast("long").alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k))


def _token_embed_sql(toks_cte: str, dim: int, n: int) -> str:
    """DuckDB spelling of :func:`_token_embed` over a CTE that yields a
    ``tok`` column."""
    return f"""
      SELECT c.tok, c.idx, {_W6} AS w
      FROM (
        SELECT tok, {_SLOT_DUCK.format(dim=dim)} AS idx,
               CAST(SUM({_SIGN_DUCK}) AS BIGINT) AS raw
        FROM (
          SELECT tok, substring(tok, CAST(i AS INTEGER), {n}) AS gram
          FROM ({toks_cte}),
               LATERAL (SELECT unnest(generate_series(1, len(tok) - {n - 1}))
                        AS i) g
          WHERE len(tok) >= {n}
        ) GROUP BY 1, 2
      ) c JOIN (
        SELECT tok, sqrt(CAST(SUM(raw * raw) AS DOUBLE)) AS nrm
        FROM (
          SELECT tok, {_SLOT_DUCK.format(dim=dim)} AS idx,
                 CAST(SUM({_SIGN_DUCK}) AS BIGINT) AS raw
          FROM (
            SELECT tok, substring(tok, CAST(i AS INTEGER), {n}) AS gram
            FROM ({toks_cte}),
                 LATERAL (SELECT unnest(generate_series(1, len(tok) - {n - 1}))
                          AS i) g
            WHERE len(tok) >= {n}
          ) GROUP BY 1, 2
        ) GROUP BY 1
      ) nr USING (tok)
      WHERE nr.nrm > 0
    """


def late_interaction_topk_sql(table: str = "documents",
                              query_terms: tuple[str, ...] = (),
                              k: int = 10, dim: int = 64, n: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`late_interaction_topk` — identical
    tokenization, vocabulary embedding, sparse-slot candidates,
    micro-unit maxima and integer score sum."""
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'"
                      for t in query_terms)
    doc_toks = (f"SELECT DISTINCT {id_col}, tok FROM ("
                f"SELECT {id_col}, unnest(string_split_regex("
                f"lower(trim({text_col})), '\\s+')) AS tok FROM {table})"
                f" WHERE tok <> ''")
    vocab_emb = _token_embed_sql(
        f"SELECT DISTINCT tok FROM ({doc_toks})", dim, n)
    q_emb = _token_embed_sql(
        f"SELECT unnest([{terms}]) AS tok", dim, n)
    return f"""
    WITH doc_toks AS ({doc_toks}),
    temb AS ({vocab_emb}),
    qemb AS (SELECT tok AS qterm, idx, w AS qw FROM ({q_emb})),
    sims AS (
      SELECT t.tok, q.qterm,
             {_SIM6.format(term=_DOT.format(a="t.w", b="q.qw"))} AS sim
      FROM temb t JOIN qemb q USING (idx)
      GROUP BY t.tok, q.qterm
    ),
    per_term AS (
      SELECT d.{id_col}, s.qterm,
             CAST(FLOOR(MAX(s.sim) * 1000000 + 0.5) AS BIGINT) AS m
      FROM doc_toks d JOIN sims s USING (tok)
      GROUP BY d.{id_col}, s.qterm
    )
    SELECT {id_col}, CAST(SUM(m) AS BIGINT) AS score_micro
    FROM per_term GROUP BY {id_col}
    ORDER BY score_micro DESC, {id_col} ASC LIMIT {k}
    """
