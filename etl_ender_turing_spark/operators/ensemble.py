"""Multi-signal quality ensembling — standardize and average the
engine's certified per-doc quality signals.

Production corpus curation (Dolma, FineWeb, RefinedWeb) never trusts one
quality signal: rule batteries, LM perplexity and statistical proxies
fail in different ways, so the robust gate is an ENSEMBLE. Rank fusion
(the retrieval trick) needs a global sort at corpus scale; the
distributed-sane equivalent is z-score standardization — two 1-row
corpus aggregates per signal (mean, variance), broadcast back, then a
narrow per-doc combine. Signals whose polarity is "lower is better"
(LM surprisal) enter negated.

Determinism: signal values are floor-quantized to 6dp decimals before
the corpus sums (order-independent; squares at 12dp), mean/variance come
out of decimal sums as bit-identical doubles, sqrt is IEEE
correctly-rounded in both engines, and each z plus the final average is
floor-quantized at 6dp (FLOOR is sign-consistent cross-engine, which is
what the hash needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.barrier import lineage_cut

from . import lm
from .textstats import (bigram_coherence, bigram_coherence_sql,
                        token_rarity, token_rarity_sql)

# dual-dialect fragments (one text, parsed by Spark AND DuckDB)
_Q6 = "CAST(FLOOR(({x}) * 1000000 + 0.5) / 1000000 AS DECIMAL(28,6))"
_QSQ = ("CAST(FLOOR(({x}) * ({x}) * 1000000000000 + 0.5) "
        "/ 1000000000000 AS DECIMAL(38,12))")


def _stats(col: str) -> list[str]:
    """mean + stddev of a signal column, decimal-summed."""
    return [
        f"CAST(SUM({_Q6.format(x=col)}) AS DOUBLE) / COUNT(*) AS mu_{col}",
        f"SQRT(GREATEST(CAST(SUM({_QSQ.format(x=col)}) AS DOUBLE)"
        f" / COUNT(*) - (CAST(SUM({_Q6.format(x=col)}) AS DOUBLE)"
        f" / COUNT(*)) * (CAST(SUM({_Q6.format(x=col)}) AS DOUBLE)"
        f" / COUNT(*)), CAST(0 AS DOUBLE))) AS sd_{col}",
    ]


def _z(col: str) -> str:
    zraw = (f"CASE WHEN sd_{col} = 0 THEN CAST(0 AS DOUBLE) "
            f"ELSE ({col} - mu_{col}) / sd_{col} END")
    return f"FLOOR(({zraw}) * 1000000 + 0.5) / 1000000"

# token frequency is standardized on the LOG scale: the raw mean is
# heavy-tailed (z-scoring it is statistically wrong) AND its square
# overflows the 12dp floor-quantization at real corpus frequencies —
# Spark's FLOOR(double) returns LONG, so x²·1e12 past ~9.2e18 wraps
# while DuckDB's stays double (caught by the sf0.1 sweep: freq ~5e4
# diverged; ln keeps every signal O(10), squares ~1e3, safe at any n).
# freq >= 1 always, so ln >= 0; quantized 6dp right after ln, the lm
# discipline.
_LOG_FREQ = ("FLOOR(LN(mean_token_freq) * 1000000 + 0.5) / 1000000")

_SIGNALS = ("mean_nll", "mean_transition_p", "log_token_freq")
# surprisal: lower is better -> negated in the combine
_COMBINE = ("FLOOR(((-z_mean_nll) + z_mean_transition_p"
            " + z_log_token_freq) / 3 * 1000000 + 0.5) / 1000000")


def quality_ensemble(df: DataFrame, counts: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, z_mean_nll, z_mean_transition_p, z_log_token_freq, quality):
    corpus-standardized LM surprisal, bigram coherence and log token
    rarity, averaged into one robust quality score (surprisal negated —
    higher ``quality`` = more fluent under all three lenses).

    Docs missing any signal (e.g. < 3 tokens for the trigram LM) drop —
    both engines agree. The joined signal frame is lineage-cut once: it
    feeds the 1-row stats aggregate AND the final combine, and each of
    its three signal subtrees is itself a corpus-scale join.
    """
    joined = (lm.stupid_backoff_scores(df, counts, text_col, id_col)
              .join(bigram_coherence(df, text_col, id_col), id_col)
              .join(token_rarity(df, text_col, id_col), id_col)
              .select(id_col, "mean_nll", "mean_transition_p",
                      F.expr(_LOG_FREQ).alias("log_token_freq")))
    joined = lineage_cut(joined)
    stats = joined.agg(*[F.expr(s) for c in _SIGNALS for s in _stats(c)])
    out = joined.crossJoin(F.broadcast(stats))
    return out.select(
        id_col,
        *[F.expr(_z(c)).alias(f"z_{c}") for c in _SIGNALS],
    ).withColumn("quality", F.expr(_COMBINE))


def quality_ensemble_sql(table: str, train_mod: int = 5,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    stats = ",\n             ".join(s for c in _SIGNALS for s in _stats(c))
    zsel = ",\n           ".join(f"{_z(c)} AS z_{c}" for c in _SIGNALS)
    return f"""
    WITH s1 AS (SELECT * FROM (
      {lm.stupid_backoff_scores_sql(table, train_mod, text_col, id_col)}
    )),
    s2 AS (SELECT * FROM ({bigram_coherence_sql(table, text_col, id_col)})),
    s3 AS (SELECT * FROM ({token_rarity_sql(table, text_col, id_col)})),
    joined AS (
      SELECT s1.{id_col}, s1.mean_nll, s2.mean_transition_p,
             {_LOG_FREQ} AS log_token_freq
      FROM s1 JOIN s2 USING ({id_col}) JOIN s3 USING ({id_col})
    ),
    st AS (
      SELECT {stats}
      FROM joined
    ),
    z AS (
      SELECT {id_col},
           {zsel}
      FROM joined CROSS JOIN st
    )
    SELECT {id_col}, z_mean_nll, z_mean_transition_p, z_log_token_freq,
           {_COMBINE} AS quality
    FROM z
    """
