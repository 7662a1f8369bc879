"""One ALS half-step (rank 2) — the distributed recommender update
(Zhou et al., "Large-scale Parallel Collaborative Filtering for the
Netflix Prize", 2008), in-engine like the k-means/IRLS/EM trainers.

The alternating-least-squares shape at scale: fix the item factor
matrix, and every user's factor vector solves an independent ridge
regression over just THAT user's ratings — one groupBy(user) whose
per-row terms are pure expressions of the item key. No factor table is
ever shuffled (rank-2 item factors derive from the md5 idiom in-plan;
a persisted-factor variant would broadcast them), and the 2×2 normal
equations invert in closed form, so the whole half-step is one
aggregate plus scalar arithmetic.

Cross-engine discipline: item factors live on an exact 1e-6 integer
grid (micro-units), so every Σ (factor products, rating-weighted
sides) is an exact BIGINT aggregate — order-independent by
construction — and the closed-form solve is the identical IEEE double
expression over identical integers on both engines. No decimal detour
needed: the floats never enter an aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK2_LAMBDA = 0.1
_MICRO = 1_000_000


def _factor_micro_spark(item: str, salt: str) -> str:
    """Integer micro-units of one factor component in [-0.5, 0.5]:
    md5 → int in [0, 1e6] → minus 5e5. Exact on the 1e-6 grid."""
    return (f"(CAST(conv(substring(md5('{salt}:' ||"
            f" CAST({item} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
            f" % {_MICRO + 1} - {_MICRO // 2})")


def _factor_micro_duck(item: str, salt: str) -> str:
    return (f"(CAST(('0x' || substr(md5('{salt}:' ||"
            f" CAST({item} AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
            f" % {_MICRO + 1} - {_MICRO // 2})")


def als_user_half_step(ratings: DataFrame, user_col: str = "user_id",
                       item_col: str = "item_id",
                       rating_col: str = "rating",
                       lam: float = RANK2_LAMBDA) -> DataFrame:
    """(user, f1, f2, n_items): each user's rank-2 factor vector from
    one closed-form ridge solve against the seeded item factors.
    ``rating`` must be integral (cast to BIGINT per row — the exactness
    contract)."""
    m1 = _factor_micro_spark(item_col, "f1")
    m2 = _factor_micro_spark(item_col, "f2")
    terms = ratings.select(
        F.col(user_col).alias("user_id"),
        F.expr(m1).alias("m1"), F.expr(m2).alias("m2"),
        F.col(rating_col).cast("long").alias("r"))
    agg = terms.groupBy("user_id").agg(
        F.sum(F.expr("m1 * m1")).alias("s11"),
        F.sum(F.expr("m1 * m2")).alias("s12"),
        F.sum(F.expr("m2 * m2")).alias("s22"),
        F.sum(F.expr("r * m1")).alias("b1"),
        F.sum(F.expr("r * m2")).alias("b2"),
        F.count(F.lit(1)).alias("n_items"))
    # closed-form 2x2 ridge solve — identical IEEE doubles from
    # identical exact integers on both engines
    return agg.selectExpr(
        "user_id",
        f"""ROUND(( (s22 / 1e12 + {lam}) * (b1 / 1e6)
                  - (s12 / 1e12) * (b2 / 1e6) )
                / ( (s11 / 1e12 + {lam}) * (s22 / 1e12 + {lam})
                  - (s12 / 1e12) * (s12 / 1e12) ), 6) AS f1""",
        f"""ROUND(( (s11 / 1e12 + {lam}) * (b2 / 1e6)
                  - (s12 / 1e12) * (b1 / 1e6) )
                / ( (s11 / 1e12 + {lam}) * (s22 / 1e12 + {lam})
                  - (s12 / 1e12) * (s12 / 1e12) ), 6) AS f2""",
        "n_items")


def als_user_half_step_sql(ratings_sql: str, lam: float = RANK2_LAMBDA
                           ) -> str:
    """DuckDB oracle over a (user_id, item_id, rating) SELECT — the
    same integer aggregates and the same closed form."""
    m1 = _factor_micro_duck("item_id", "f1")
    m2 = _factor_micro_duck("item_id", "f2")
    return f"""
    WITH r AS ({ratings_sql}),
    terms AS (
      SELECT user_id, {m1} AS m1, {m2} AS m2,
             CAST(rating AS BIGINT) AS rr
      FROM r
    ),
    agg AS (
      SELECT user_id,
             CAST(SUM(m1 * m1) AS BIGINT) AS s11,
             CAST(SUM(m1 * m2) AS BIGINT) AS s12,
             CAST(SUM(m2 * m2) AS BIGINT) AS s22,
             CAST(SUM(rr * m1) AS BIGINT) AS b1,
             CAST(SUM(rr * m2) AS BIGINT) AS b2,
             COUNT(*) AS n_items
      FROM terms GROUP BY 1
    )
    SELECT user_id,
           ROUND(( (s22 / 1e12 + {lam}) * (b1 / 1e6)
                 - (s12 / 1e12) * (b2 / 1e6) )
               / ( (s11 / 1e12 + {lam}) * (s22 / 1e12 + {lam})
                 - (s12 / 1e12) * (s12 / 1e12) ), 6) AS f1,
           ROUND(( (s11 / 1e12 + {lam}) * (b2 / 1e6)
                 - (s12 / 1e12) * (b1 / 1e6) )
               / ( (s11 / 1e12 + {lam}) * (s22 / 1e12 + {lam})
                 - (s12 / 1e12) * (s12 / 1e12) ), 6) AS f2,
           CAST(n_items AS BIGINT) AS n_items
    FROM agg
    """


__all__ = ["als_user_half_step", "als_user_half_step_sql",
           "RANK2_LAMBDA"]
