"""Frequent-itemset mining (pair level) — co-occurrence with support
and lift, the market-basket/co-view analysis an order or session fact
table feeds.

Scale shape: the only corpus-scale operations are one groupBy to form
baskets and one aggregate over exploded pairs. Pair expansion happens
INSIDE each basket's sorted array (the in-bucket lambda shape shared
with the banded dedup families), so cost is Σ C(|basket|, 2) — bounded
by the basket cap, never by corpus size, and a degenerate mega-basket
(a crawler's cart with 50k items → 1.25B pairs) is DROPPED at the cap
rather than silently detonating the stage. Lift denominators come from
the per-item document frequencies — two broadcast-joinable frames.

Cross-engine: counts are exact integers; lift is one IEEE double
expression over exact counts, round6u-quantized — the DuckDB oracle
computes the identical pairs relationally (self-join inside baskets
under the same cap) and hash-matches value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.rounding import round6u, round6u_sql

MAX_BASKET = 100


def frequent_pairs(df: DataFrame, basket_col: str, item_col: str,
                   min_support: int = 2,
                   max_basket: int = MAX_BASKET) -> DataFrame:
    """(item_a, item_b, n_both, lift6): item pairs co-occurring in at
    least ``min_support`` baskets, with lift against independence.
    ``item_a < item_b``; duplicate items within a basket count once."""
    baskets = (df.groupBy(basket_col)
               .agg(F.sort_array(F.collect_set(F.col(item_col)))
                    .alias("items"))
               .filter(F.size("items").between(2, max_basket)))
    pairs = baskets.select(F.explode(F.expr(
        "flatten(transform(items, (a, i) ->"
        " transform(slice(items, i + 2, size(items)), b ->"
        " struct(a AS item_a, b AS item_b))))")).alias("p")) \
        .select("p.item_a", "p.item_b")
    both = (pairs.groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_both"))
            .filter(F.col("n_both") >= min_support))
    # document frequency per item and total baskets — tiny frames
    item_df = (baskets.select(F.explode("items").alias("item"))
               .groupBy("item").agg(F.count(F.lit(1)).alias("n_item")))
    totals = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (both
            .join(F.broadcast(item_df.select(
                F.col("item").alias("item_a"),
                F.col("n_item").alias("n_a"))), "item_a")
            .join(F.broadcast(item_df.select(
                F.col("item").alias("item_b"),
                F.col("n_item").alias("n_b"))), "item_b")
            .crossJoin(F.broadcast(totals))
            .select("item_a", "item_b", "n_both",
                    round6u((F.col("n_both").cast("double")
                             * F.col("n_baskets"))
                            / (F.col("n_a").cast("double")
                               * F.col("n_b"))).alias("lift6")))


def frequent_pairs_sql(table: str, basket_col: str, item_col: str,
                       min_support: int = 2,
                       max_basket: int = MAX_BASKET) -> str:
    """DuckDB oracle for :func:`frequent_pairs`: baskets as DISTINCT
    (basket, item) under the same size cap, pairs via self-join."""
    lift = round6u_sql("(CAST(n_both AS DOUBLE) * n_baskets)"
                       " / (CAST(n_a AS DOUBLE) * n_b)")
    return f"""
    WITH bi AS (SELECT DISTINCT {basket_col} AS basket,
                       {item_col} AS item FROM {table}),
    sized AS (SELECT basket FROM bi GROUP BY basket
              HAVING COUNT(*) BETWEEN 2 AND {max_basket}),
    kept AS (SELECT bi.* FROM bi JOIN sized USING (basket)),
    cooc AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM kept a JOIN kept b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
    ),
    idf AS (SELECT item, COUNT(*) AS n_item FROM kept GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_baskets FROM sized)
    SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both,
           {lift} AS lift6
    FROM cooc
    JOIN (SELECT item AS item_a, n_item AS n_a FROM idf) USING (item_a)
    JOIN (SELECT item AS item_b, n_item AS n_b FROM idf) USING (item_b)
    CROSS JOIN t
    """


__all__ = ["frequent_pairs", "frequent_pairs_sql", "MAX_BASKET"]
