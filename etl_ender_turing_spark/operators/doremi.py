"""DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429) —
one exponentiated-gradient step, executable and value-certifiable.

DoReMi tunes the TRAINING MIXTURE over data domains: domains whose
proxy-model loss exceeds a reference get UP-weighted (they are learnable
but under-served), via multiplicative-weights updates
``w'_i ∝ w_i · exp(η · excess_loss_i)``. The full recipe loops this with
proxy retraining; the per-step dataflow — per-domain loss aggregation,
excess over a reference, exponentiated update, renormalization — is what
a data engine executes, and ONE step with the repo's trigram-LM
surprisal standing in for proxy loss and the corpus-wide mean as the
reference is fully expressible and hash-certifiable (the same
"fixed-iteration core certifies the loop's dataflow" approach as
``similarity.kmeans_one_step``).

Scale shape: the corpus-scale work is the LM scoring join
(``lm.stupid_backoff_scores`` — already certified); everything here
aggregates to DOMAIN cardinality and runs on K-row frames with 1-row
broadcast reductions. Determinism: per-doc surprisal totals are
re-quantized to 6dp decimals before the domain sum (order-independent);
``exp`` outputs are floor-quantized the same way ``lm._TERM`` floors
``ln`` (a last-ulp libm divergence cannot reach the hash); the final
share is a ``round6u`` ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.barrier import lineage_cut

from . import lm
from ..functions.rounding import round6u_sql

# dual-dialect fragments (parsed by both Spark and DuckDB, the lm._P_CASE
# trick). `dm` = domain mean nll, `ref` = corpus mean nll — both doubles
# derived from decimal sums, bit-identical cross-engine.
_EXCESS = "GREATEST(dm - ref, CAST(0 AS DOUBLE))"

# per-doc surprisal total, re-quantized for an order-independent sum
_DOC_TOT = ("CAST(FLOOR(mean_nll * n_scored * 1000000 + 0.5) / 1000000 "
            "AS DECIMAL(28,6))")


def _efac(eta: float) -> str:
    return (f"CAST(FLOOR(EXP(CAST({eta!r} AS DOUBLE) * {_EXCESS}) "
            f"* 1000000 + 0.5) / 1000000 AS DECIMAL(28,6))")


def doremi_step(df: DataFrame, counts: DataFrame, eta: float = 0.1,
                text_col: str = "text", id_col: str = "doc_id",
                domain_col: str = "source") -> DataFrame:
    """(domain, n_scored, mean_nll, excess_nll, weight): one DoReMi
    multiplicative-weights step from a uniform prior.

    ``excess_nll`` is each domain's mean trigram-LM surprisal above the
    corpus mean, clipped at 0 (the paper's reference-model loss, with
    the corpus average standing in as the executable reference);
    ``weight`` is the renormalized ``exp(eta · excess)`` mixture share —
    domains at/below the reference share the floor weight, the
    worst-served domain gets the largest boost.
    """
    scores = lm.stupid_backoff_scores(df, counts, text_col, id_col)
    per_dom = (scores.join(df.select(id_col, domain_col), id_col)
               .groupBy(domain_col)
               .agg(F.sum("n_scored").cast("long").alias("n_scored"),
                    F.expr(f"CAST(SUM({_DOC_TOT}) AS DOUBLE)"
                           " / SUM(n_scored)").alias("dm"))
               # K-row result of the corpus-scale LM join, consumed by
               # THREE branches (ref, upd, esum): cut the lineage so the
               # scoring join runs once
               )
    per_dom = lineage_cut(per_dom)
    dmtot = _DOC_TOT.replace("mean_nll", "dm")
    ref = per_dom.agg(
        F.expr(f"CAST(SUM({dmtot}) AS DOUBLE) / SUM(n_scored)")
        .alias("ref"))
    # ^ corpus mean from the domain table: quantized dm·n_scored terms,
    # decimal-summed — identical arithmetic to the oracle's `ref` CTE
    upd = (per_dom.crossJoin(F.broadcast(ref))
           .select(domain_col, "n_scored",
                   F.col("dm").alias("mean_nll"),
                   F.expr(_EXCESS).alias("excess_nll"),
                   F.expr(_efac(eta)).alias("_e")))
    esum = upd.agg(F.sum("_e").alias("_esum"))
    return (upd.crossJoin(F.broadcast(esum))
            .select(domain_col, "n_scored", "mean_nll", "excess_nll",
                    F.expr("FLOOR(CAST(_e AS DOUBLE) / CAST(_esum AS"
                           " DOUBLE) * 1000000 + 0.5) / 1000000")
                    .alias("weight")))


def doremi_step_sql(table: str, eta: float = 0.1, train_mod: int = 5,
                    text_col: str = "text", id_col: str = "doc_id",
                    domain_col: str = "source") -> str:
    dmtot = _DOC_TOT.replace("mean_nll", "dm")
    w_ratio = "CAST(_e AS DOUBLE) / CAST(_esum AS DOUBLE)"
    return f"""
    WITH scores AS (SELECT * FROM (
      {lm.stupid_backoff_scores_sql(table, train_mod, text_col, id_col)}
    )),
    per_dom AS (
      SELECT d.{domain_col},
             CAST(SUM(s.n_scored) AS BIGINT) AS n_scored,
             CAST(SUM({_DOC_TOT.replace('mean_nll', 's.mean_nll')
                       .replace('n_scored', 's.n_scored')}) AS DOUBLE)
               / SUM(s.n_scored) AS dm
      FROM scores s JOIN {table} d USING ({id_col})
      GROUP BY d.{domain_col}
    ),
    refc AS (
      SELECT CAST(SUM({dmtot}) AS DOUBLE) / SUM(n_scored) AS ref
      FROM per_dom
    ),
    upd AS (
      SELECT {domain_col}, n_scored, dm AS mean_nll,
             {_EXCESS} AS excess_nll, {_efac(eta)} AS _e
      FROM per_dom CROSS JOIN refc
    ),
    es AS (SELECT SUM(_e) AS _esum FROM upd)
    SELECT {domain_col}, n_scored, mean_nll, excess_nll,
           {round6u_sql(w_ratio)} AS weight
    FROM upd CROSS JOIN es
    """
