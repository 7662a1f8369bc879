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


def bucketed_range_pairs(df, key_col: str, epoch_col, id_col: str,
                         max_gap: int):
    """Range SELF-join by time-bucket equi-join — the telemetry/
    sensor-correlation pattern: all row pairs sharing ``key_col``
    whose ``epoch_col`` values lie within ``max_gap`` of each other,
    WITHOUT a per-key cross join.

    A naive range join explodes quadratically on a hot key; bucketing
    by ``floor(t / max_gap)`` turns it into an equi-join on
    (key, bucket): a pair within the gap spans at most two adjacent
    buckets, so the LEFT side emits each row under its own bucket AND
    the next one, the RIGHT side under its own only — every qualifying
    pair matches through exactly one bucket (same-bucket pairs would
    match in both directions; the (t, id) orientation filter keeps
    one), and the shuffle carries (key, bucket) groups whose size
    tracks the key's burst rate within one gap window, not its total
    history. Returns (key, id_a, id_b, gap) with
    (t_a, id_a) < (t_b, id_b) and 0 <= gap <= max_gap.
    """
    from pyspark.sql import functions as F
    e = df.select(F.col(key_col).alias("k"),
                  epoch_col.cast("long").alias("t"),
                  F.col(id_col).alias("i"))
    left = e.select(
        "k", "t", "i",
        F.explode(F.array(F.expr(f"t div {max_gap}"),
                          F.expr(f"t div {max_gap} + 1"))).alias("bkt"))
    right = e.select(F.col("k"), F.col("t").alias("t2"),
                     F.col("i").alias("i2"),
                     F.expr(f"t div {max_gap}").alias("bkt"))
    return (left.join(right, ["k", "bkt"])
            .filter((F.col("t") < F.col("t2"))
                    | ((F.col("t") == F.col("t2"))
                       & (F.col("i") < F.col("i2"))))
            .filter(F.col("t2") - F.col("t") <= max_gap)
            .select(F.col("k").alias(key_col),
                    F.col("i").alias(f"{id_col}_a"),
                    F.col("i2").alias(f"{id_col}_b"),
                    (F.col("t2") - F.col("t")).alias("gap"))
            .distinct())
