"""Schema conformance with drift auditing.

The reference reconciles incoming dict keys against the declared DB schema at
load time: keys without a matching column are dropped with a warning, missing
columns are tolerated (reference: ET-ETL-DWH-PY312/ETL/Load.py:94-110;
unmatched-table warning ETL/Load.py:64-69, ETL/utils.py:279-281).

Catalyst prunes columns for free, but silently; this operator keeps the
reference's *audit* behavior: it logs what was dropped and what was filled
with NULLs, then selects/casts to the declared schema so every downstream
consumer sees exactly the registry shape.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F, types as T

log = logging.getLogger(__name__)


def conform(df: DataFrame, target: T.StructType, table_name: str = "?") -> DataFrame:
    """Project ``df`` onto ``target``: drop extras (warn), add missing as
    NULL (warn), cast mismatched types to the declared ones.

    Pure column-level projection — no shuffle, fully pushdown-transparent.
    """
    have = {f.name: f for f in df.schema.fields}
    want = target.fields

    extras = [c for c in df.columns if c not in {f.name for f in want}]
    missing = [f.name for f in want if f.name not in have]
    if extras:
        log.warning("conform(%s): dropping unmatched columns %s", table_name, extras)
    if missing:
        log.warning("conform(%s): filling missing columns with NULL %s",
                    table_name, missing)

    cols = []
    for f in want:
        if f.name in have:
            col = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def reconcile(a: DataFrame, b: DataFrame, key_cols: list[str],
              compare_cols: list[str] | None = None) -> DataFrame:
    """Table reconciliation: one summary row — keys only in A, only in B,
    in both-and-equal, in both-but-changed.

    The migration-validation operator: run the reference pipeline and
    this engine over the same input, reconcile on the unique key, expect
    (0, 0, n, 0). One shuffle per side on the key columns; the compare is
    a null-safe equality conjunction evaluated in the joined projection —
    no collect, works at any table size.
    """
    from pyspark.sql import functions as F

    cmp_cols = compare_cols or [c for c in a.columns if c not in key_cols]
    av = a.select(*key_cols,
                  *[F.col(c).alias(f"_a_{c}") for c in cmp_cols],
                  F.lit(1).alias("_in_a"))
    bv = b.select(*key_cols,
                  *[F.col(c).alias(f"_b_{c}") for c in cmp_cols],
                  F.lit(1).alias("_in_b"))
    j = av.join(bv, key_cols, "full_outer")
    # key-only tables (cmp_cols == []) still classify presence; "same"
    # defaults True so no key is ever marked changed
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    return j.agg(
        F.count(F.when(F.col("_in_b").isNull(), 1)).alias("n_only_a"),
        F.count(F.when(F.col("_in_a").isNull(), 1)).alias("n_only_b"),
        F.count(F.when(F.col("_in_a").isNotNull()
                       & F.col("_in_b").isNotNull() & same, 1))
        .alias("n_equal"),
        F.count(F.when(F.col("_in_a").isNotNull()
                       & F.col("_in_b").isNotNull() & ~same, 1))
        .alias("n_changed"))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level change-data-capture between two snapshots of a keyed
    table: one row per key that was ``added``, ``removed`` or ``changed``
    (unchanged keys emit nothing) — the row-level complement of
    :func:`reconcile`'s one-row summary, and the input a downstream
    incremental consumer (MERGE, cache invalidation, re-embedding queue)
    actually needs.

    Scale shape: one shuffle per side on the key for the full outer
    join; comparison is a null-safe equality conjunction in the joined
    projection — no collect, output is bounded by the churn, not the
    table. At 100 TB, bucket both snapshots by the key (readers.py
    bucketing note) and the join plans with zero exchanges.
    """
    from pyspark.sql import functions as F

    cmp_cols = compare_cols or [c for c in old.columns if c not in key_cols]
    av = old.select(*key_cols,
                    *[F.col(c).alias(f"_a_{c}") for c in cmp_cols],
                    F.lit(1).alias("_in_a"))
    bv = new.select(*key_cols,
                    *[F.col(c).alias(f"_b_{c}") for c in cmp_cols],
                    F.lit(1).alias("_in_b"))
    j = av.join(bv, key_cols, "full_outer")
    # key-only tables (cmp_cols == []) still classify presence; "same"
    # defaults True so no key is ever marked changed
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    change = (F.when(F.col("_in_a").isNull(), "added")
              .when(F.col("_in_b").isNull(), "removed")
              .when(~same, "changed"))
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .select(*key_cols, "change_type"))
