"""Count-based n-gram language model: distributed training + stupid-
backoff scoring — the executable form of CCNet's perplexity filter.

CCNet (reference pipeline family; see PAPERS.md) gates web text on the
perplexity of a KenLM 5-gram model trained on a trusted corpus. The
Spark-native counterpart here is a trigram model scored with **stupid
backoff** (Brants et al. 2007, "Large Language Models in Machine
Translation") — the scheme Google introduced precisely because raw
distributed count tables scale where normalized Kneser-Ney backoff does
not: no discounting pass, no normalization, just counts and a fixed
back-off factor, so training is three `groupBy` aggregations and scoring
is a handful of joins.

Scale shape (100 TB):
- **Training** is one pass over the trusted partition: explode n-grams,
  partial+final count. The resulting tables are VOCABULARY-scale
  (unigrams), vocab²-bounded (bigrams), vocab³-bounded (trigrams) — in
  practice Zipf-truncated far below the corpus size. A production run
  persists the counts table (like the BM25/IVF indexes in this repo)
  and prunes it with a min-count floor; the operator keeps every count
  so the certifying oracle can recompute it exactly.
- **Scoring** joins each document position against the count tables.
  Unigram counts + the 1-row total broadcast by construction (vocab-
  scale); bigram/trigram tables are left to AQE, which broadcasts them
  while they fit and shuffles on the gram hash (uniform, near-unique
  keys) when they don't. No windows, no self-joins, no skew: the only
  wide operation is the final per-doc aggregation.

Cross-engine exactness: every branch of the backoff CASE is spelled out
in ONE SQL snippet evaluated by BOTH engines (identical IEEE double
sequence — literals, casts and operation order included), and each
per-position surprisal term -ln(p) (non-negative: p <= 1 in every
branch) is floored at 6dp and decimal-summed, the same contract as
`textstats.char_entropy`, so a last-ulp `ln` divergence cannot reach
the hash.

Reference parity note: the reference engine has no LM operator — this
family belongs to the training-data-pipeline mandate (SURVEY.md §6),
alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.barrier import lineage_cut

# Tokenizer shared with the rest of the text family: lowercase,
# whitespace split, empty tokens dropped (multi-space safe).
_TOK_SPARK = "filter(split(lower(trim({col})), ' '), x -> x <> '')"
_TOK_DUCK = ("list_filter(string_split(lower(trim({col})), ' '),"
             " x -> x <> '')")

# The stupid-backoff score for one position, over the left-joined count
# columns (c3 tri count, cbx its context-bigram count, cb bigram count,
# cux its context-unigram count, cu unigram count, total train tokens).
# A seen trigram implies its prefix bigram was counted (same training
# pass), so cbx is non-NULL whenever c3 is — likewise cux/cb. The final
# ELSE is the deterministic OOV floor alpha² / total. Valid in BOTH
# dialects verbatim; 0.4 parses to the same double and the parenthesized
# operation order fixes the IEEE sequence.
_P_CASE = """
CASE WHEN c3 IS NOT NULL THEN CAST(c3 AS DOUBLE) / CAST(cbx AS DOUBLE)
     WHEN cb IS NOT NULL
       THEN 0.4 * (CAST(cb AS DOUBLE) / CAST(cux AS DOUBLE))
     WHEN cu IS NOT NULL
       THEN 0.4 * (0.4 * (CAST(cu AS DOUBLE) / CAST(total AS DOUBLE)))
     ELSE 0.4 * (0.4 * (1.0 / CAST(total AS DOUBLE))) END
"""

# Per-position surprisal, 6dp-floored (non-negative, so the shared
# half-up floor contract from functions/rounding.py applies).
_TERM = f"FLOOR(-ln({_P_CASE}) * 1000000 + 0.5) / 1000000"


def train_ngram_counts(df: DataFrame, train_mod: int = 5,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Train trigram/bigram/unigram count tables on the trusted
    partition ``id_col % train_mod == 0`` (CCNet trains on Wikipedia;
    the deterministic modulus stands in for the trusted-corpus split).

    Returns (ord, gram, cnt): three partial+final count aggregations
    over a narrow n-gram explode, unioned. Output is vocab-scale per
    order — the persistable LM artifact.
    """
    toks = (df.filter((F.col(id_col) % train_mod) == 0)
            .select(F.expr(_TOK_SPARK.format(col=text_col)).alias("t")))

    def grams(n: int) -> DataFrame:
        # integer positional explode + codegen concat (not the
        # interpreted transform-lambda of ngram_array_expr)
        parts = ", ".join(f"element_at(t, _i + {k})" for k in range(n))
        return (toks.filter(F.size("t") >= n)
                .select("t", F.expr(f"explode(sequence(1, size(t)"
                                    f" - {n - 1}))").alias("_i"))
                .select(F.expr(f"concat_ws(' ', {parts})").alias("gram"))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .select(F.lit(n).cast("int").alias("ord"), "gram", "cnt"))

    return grams(1).unionByName(grams(2)).unionByName(grams(3))


def train_ngram_counts_sql(table: str, train_mod: int = 5,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """DuckDB CTE body producing the same (ord, gram, cnt) table."""
    tok = _TOK_DUCK.format(col=text_col)
    return f"""
    WITH _tr AS (
      SELECT {tok} AS t FROM {table} WHERE {id_col} % {train_mod} = 0
    ),
    _g1 AS (SELECT 1 AS ord, g AS gram, COUNT(*) AS cnt
            FROM (SELECT unnest(t) AS g FROM _tr) GROUP BY 2),
    _g2 AS (SELECT 2 AS ord, g AS gram, COUNT(*) AS cnt
            FROM (SELECT unnest(list_transform(
                     generate_series(2, len(t)),
                     i -> t[i - 1] || ' ' || t[i])) AS g FROM _tr)
            GROUP BY 2),
    _g3 AS (SELECT 3 AS ord, g AS gram, COUNT(*) AS cnt
            FROM (SELECT unnest(list_transform(
                     generate_series(3, len(t)),
                     i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS g
                  FROM _tr)
            GROUP BY 2),
    counts AS (SELECT * FROM _g1 UNION ALL SELECT * FROM _g2
               UNION ALL SELECT * FROM _g3)
    """


def top_ngrams(counts: DataFrame, k: int = 10) -> DataFrame:
    """Top-k grams per order (cnt desc, gram asc — a total order, grams
    are distinct within an order): the human-inspectable head of the
    trained model, and the certifying projection of the count tables.
    The row_number-<=k filter triggers Catalyst's WindowGroupLimit
    two-phase rewrite, so the per-order sort is pruned map-side."""
    from pyspark.sql.window import Window
    w = (Window.partitionBy("ord")
         .orderBy(F.desc("cnt"), F.asc("gram")))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("ord", "rn", "gram", F.col("cnt").cast("long")
                    .alias("cnt")))


def stupid_backoff_scores(df: DataFrame, counts: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document mean stupid-backoff surprisal (nats/token) — the
    perplexity-filter signal: low = fluent under the trained counts,
    high = boilerplate, shuffled or out-of-domain text. Documents with
    fewer than 3 tokens have no scored position and drop out (both
    engines agree: the position explode is empty).

    Returns (doc_id, n_scored, mean_nll).
    """
    # the count table feeds SIX consumers (c1 three times, c2 twice, c3
    # once) — cut it once so the training explode + aggregations run a
    # single time and the analyzed plan stops carrying six copies of
    # the training subtree (guide §3.3; counts is the vocab-scale
    # persistable artifact, so the barrier is the natural break)
    counts = lineage_cut(counts)
    c1 = counts.filter("ord = 1").select(F.col("gram").alias("g1"),
                                         F.col("cnt").alias("n1"))
    c2 = counts.filter("ord = 2").select(F.col("gram").alias("g2"),
                                         F.col("cnt").alias("n2"))
    c3 = counts.filter("ord = 3").select(F.col("gram").alias("g3"),
                                         F.col("cnt").alias("n3"))
    # vocab-scale by construction -> sanctioned broadcast; c2/c3 are
    # vocab²/vocab³-bounded and stay AQE-sized (no hint)
    total = c1.agg(F.sum("n1").cast("long").alias("total"))

    # integer positional explode + plain projections (codegen), not a
    # transform(sequence, i -> struct(...)) lambda (interpreted)
    pos = (df.select(F.col(id_col),
                     F.expr(_TOK_SPARK.format(col=text_col)).alias("t"))
           .filter(F.size("t") >= 3)
           .select(id_col, "t",
                   F.expr("explode(sequence(3, size(t)))").alias("_i"))
           .select(id_col,
                   F.expr("concat_ws(' ', element_at(t, _i - 2),"
                          " element_at(t, _i - 1), element_at(t, _i))")
                   .alias("tri"),
                   F.expr("concat_ws(' ', element_at(t, _i - 2),"
                          " element_at(t, _i - 1))").alias("bix"),
                   F.expr("concat_ws(' ', element_at(t, _i - 1),"
                          " element_at(t, _i))").alias("bi"),
                   F.expr("element_at(t, _i - 1)").alias("ux"),
                   F.expr("element_at(t, _i)").alias("u")))

    joined = (pos
              .join(c3, pos.tri == c3.g3, "left")
              .join(c2.select(F.col("g2").alias("gbx"),
                              F.col("n2").alias("nbx")),
                    pos.bix == F.col("gbx"), "left")
              .join(c2, pos.bi == c2.g2, "left")
              .join(F.broadcast(c1.select(F.col("g1").alias("gux"),
                                          F.col("n1").alias("nux"))),
                    pos.ux == F.col("gux"), "left")
              .join(F.broadcast(c1), pos.u == c1.g1, "left")
              .crossJoin(F.broadcast(total))
              .select(id_col,
                      F.col("n3").alias("c3"), F.col("nbx").alias("cbx"),
                      F.col("n2").alias("cb"), F.col("nux").alias("cux"),
                      F.col("n1").alias("cu"), "total"))

    return (joined
            .select(id_col, F.expr(_TERM).alias("_s"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_scored"),
                 F.expr("CAST(SUM(CAST(_s AS DECIMAL(28,6))) AS DOUBLE)"
                        " / COUNT(_s)").alias("mean_nll")))


def stupid_backoff_scores_sql(table: str, train_mod: int = 5,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """Full DuckDB oracle for :func:`stupid_backoff_scores` over counts
    trained by :func:`train_ngram_counts` — same tokenizer, same CASE
    snippet, same 6dp-floored decimal-summed surprisal."""
    tok = _TOK_DUCK.format(col=text_col)
    return f"""{train_ngram_counts_sql(table, train_mod, text_col, id_col)},
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts
            WHERE ord = 1),
    _pos0 AS (
      SELECT {id_col}, unnest(list_transform(
               generate_series(3, len(t)),
               i -> struct_pack(
                 tri := t[i - 2] || ' ' || t[i - 1] || ' ' || t[i],
                 bix := t[i - 2] || ' ' || t[i - 1],
                 bi  := t[i - 1] || ' ' || t[i],
                 ux  := t[i - 1],
                 u   := t[i]))) AS s
      FROM (SELECT {id_col}, {tok} AS t FROM {table})
    ),
    _pos AS (SELECT {id_col}, s.tri AS tri, s.bix AS bix, s.bi AS bi,
                    s.ux AS ux, s.u AS u FROM _pos0),
    _j AS (
      SELECT p.{id_col},
             t3.cnt AS c3, tbx.cnt AS cbx, t2.cnt AS cb,
             tux.cnt AS cux, t1.cnt AS cu, tot.total AS total
      FROM _pos p
      LEFT JOIN (SELECT gram, cnt FROM counts WHERE ord = 3) t3
        ON p.tri = t3.gram
      LEFT JOIN (SELECT gram, cnt FROM counts WHERE ord = 2) tbx
        ON p.bix = tbx.gram
      LEFT JOIN (SELECT gram, cnt FROM counts WHERE ord = 2) t2
        ON p.bi = t2.gram
      LEFT JOIN (SELECT gram, cnt FROM counts WHERE ord = 1) tux
        ON p.ux = tux.gram
      LEFT JOIN (SELECT gram, cnt FROM counts WHERE ord = 1) t1
        ON p.u = t1.gram
      CROSS JOIN tot
    )
    SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CAST({_TERM} AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*) AS mean_nll
    FROM _j GROUP BY {id_col}
    """


def top_ngrams_sql(table: str, k: int = 10, train_mod: int = 5,
                   text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`top_ngrams` over trained counts."""
    return f"""{train_ngram_counts_sql(table, train_mod, text_col, id_col)}
    SELECT ord, rn, gram, cnt FROM (
      SELECT CAST(ord AS INT) AS ord, gram, CAST(cnt AS BIGINT) AS cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY ord
                    ORDER BY cnt DESC, gram ASC) AS INT) AS rn
      FROM counts
    ) WHERE rn <= {k}
    """
