"""Declarative data-quality constraint audit (dbt-test / Deequ shape).

The reference trusts its DWH writes blindly (ETL/Load.py has no
post-load validation); a production warehouse audits every batch:
unique keys, non-null columns, referential integrity, accepted value
sets. Each check here is ONE aggregation (or one anti-join count) that
returns a (constraint, n_violations) row — the audit of a whole table
is a union of tiny aggregates, cheap at any scale because every check
is a single pass with partial+final combine and FK checks broadcast
the parent's key set only when AQE sizes it in.

Composable: ``audit(df, spec)`` runs the full battery and returns one
DataFrame — write it to the metrics sink beside the load, alert on
n_violations > 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows participating in a duplicate key group (0 = key is unique)."""
    name = "unique:" + ",".join(cols)
    dup = (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 1)
           .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations")))
    return dup.select(F.lit(name).alias("constraint"),
                      F.col("n_violations").cast("long"))


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return (df.agg((F.count(F.lit(1)) - F.count(col)).alias("n_violations"))
            .select(F.lit(f"not_null:{col}").alias("constraint"),
                    F.col("n_violations").cast("long")))


def check_accepted_values(df: DataFrame, col: str,
                          values: tuple[str, ...]) -> DataFrame:
    name = f"accepted:{col}"
    return (df.filter(~F.col(col).isin(*values) | F.col(col).isNull())
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("constraint"),
                    F.col("n_violations").cast("long")))


def check_fk(child: DataFrame, child_col: str,
             parent: DataFrame, parent_col: str) -> DataFrame:
    """Child rows whose key has no parent (left anti on the join key)."""
    name = f"fk:{child_col}->{parent_col}"
    orphans = child.join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col, "left_anti")
    return (orphans.agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("constraint"),
                    F.col("n_violations").cast("long")))


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union the battery into one (constraint, n_violations) frame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
