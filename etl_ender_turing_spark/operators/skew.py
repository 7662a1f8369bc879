"""Skew-mitigation operators for 100 TB-scale aggregation.

Skewed shuffles are the dominant failure mode at scale. The engine's
strategy, in order of preference:

1. AQE (session default, see ``session.py``): runtime skew-join splitting
   and shuffle-partition coalescing — free, covers most join skew.
2. Broadcast: dimensions never shuffle at all (see the join catalog
   queries); the skewed fact side stays put.
3. Explicit salting (this module): when the *group-key* space itself is
   tiny (few distinct statuses/types over billions of rows), the final
   aggregation stage degenerates to #groups tasks no matter how AQE
   splits the shuffle. The fix is a two-phase shape where phase 1 groups
   by (key, salt) — parallelism = #groups × #salts — and phase 2 merges
   the small partial results.

The salted distinct-count below picks the salt as ``hash(value) % n``,
so each distinct value lands in exactly one bucket and the per-bucket
distinct counts sum to the exact global distinct count — no
approximation, unlike HLL sketches (``approx_count_distinct``), which
remain the right tool when ~2% error is acceptable and memory is tight.

The reference has no aggregation layer at all (its metrics arrive
precomputed from the API; SURVEY §2.5) — this is the scale path for
recomputing its caller/agent cardinality metrics over raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_distinct_count(df: DataFrame, group_cols: list[str],
                          distinct_col: str, n_salts: int = 64,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group, skew-proof.

    Phase 1 shuffles on (group, xxhash64(value) % n_salts): value-disjoint
    buckets, so per-bucket ``count_distinct`` values are disjoint counts.
    Phase 2 shuffles only #groups × n_salts tiny partial rows and sums
    them. Peak per-task distinct-set state shrinks by ~n_salts versus the
    naive single-phase plan.
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    partial = (df.groupBy(*group_cols, salt.alias("_salt"))
               .agg(F.count_distinct(distinct_col).alias("_partial")))
    return (partial.groupBy(*group_cols)
            .agg(F.sum("_partial").alias(out_col)))
