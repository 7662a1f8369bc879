"""HyperLogLog from first principles (Flajolet et al. 2007) —
fixed-memory cardinality estimation whose cross-engine certification is
VALUE-EXACT, the distinct-count counterpart of the count-min sketch.

The builtin `approx_count_distinct` row (q_approx_sketches) can only be
bound-checked — its registers are engine-private. This implementation
derives every register from the repo's md5 idiom, so the DuckDB oracle
rebuilds the identical sketch and the estimate matches bit-for-bit:

- bucket  = h mod m (m = 256 registers), w = h div m (24 bits left);
- rho(w)  = leading-zero rank inside the 24-bit window + 1, computed as
  ``25 - length(bin(w))`` — a STRING-length bit trick, because
  floor(log2(w)) goes through libm and a last-ulp divergence between
  engines would flip a register; ``bin``'s minimal binary string is
  exact arithmetic on both;
- registers fold with integer MAX (order-free by definition);
- the harmonic sum Σ 2^-M_j uses ``1.0 / (1 << M_j)`` — every term is
  an exact power of two and m·2^0 … 2^-25 spans < 53 bits, so EVERY
  partial sum is exactly representable: the one floating-point
  reduction in the operator is order-independent WITHOUT the decimal
  detour.

Raw estimate only (alpha_m · m² / Σ): the small/large-range corrections
are documented out of scope — they need ln(), which is the libm
dependency this operator exists to avoid. Memory: m integers total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.rounding import round6u, round6u_sql

HLL_M = 256                       # registers (b = 8 bucket bits)
# alpha_256 per Flajolet et al. §4: 0.7213 / (1 + 1.079 / m)
# CASTs matter: bare decimal literals parse as DECIMAL on BOTH engines
# with different division semantics — a last-ulp trap
_ALPHA = ("(CAST(0.7213 AS DOUBLE)"
          " / (1 + CAST(1.079 AS DOUBLE) / 256))")


def _h32_spark(key: str) -> str:
    return (f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT)")


def _h32_duck(key: str) -> str:
    return (f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))"
            f"::UBIGINT AS BIGINT)")


def hll_estimate(df: DataFrame, key_col: str) -> DataFrame:
    """One row: (n_exact, hll_raw6, rel_err6, n_registers_set) — the
    raw HLL estimate next to the exact distinct count it approximates,
    with the relative error certified value-exactly. Two aggregates:
    one ≤m-group register fold, one exact count-distinct (the
    comparison baseline a production job would drop)."""
    h = _h32_spark(key_col)
    regs = (df.select(
        F.expr(f"({h}) % {HLL_M}").alias("bucket"),
        F.expr(f"CASE WHEN ({h}) div {HLL_M} = 0 THEN 25"
               f" ELSE 25 - length(bin(({h}) div {HLL_M})) END")
        .alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("m_j")))
    est = regs.agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        F.sum(F.expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT),"
                     " CAST(m_j AS INT))")).alias("_sum_set"))
    # empty registers contribute 2^0 = 1 each to the harmonic sum
    est = est.withColumn(
        "hll_raw6",
        round6u(F.expr(f"{_ALPHA} * {HLL_M} * {HLL_M}"
                       f" / (_sum_set + ({HLL_M} - n_registers_set))")))
    exact = df.agg(F.countDistinct(key_col).alias("n_exact"))
    return (exact.crossJoin(est)
            .select("n_exact", "hll_raw6",
                    round6u(F.abs(F.col("hll_raw6") - F.col("n_exact"))
                            / F.col("n_exact")).alias("rel_err6"),
                    "n_registers_set"))


def hll_estimate_sql(table: str, key: str) -> str:
    """DuckDB oracle — identical registers, identical exact sums."""
    h = _h32_duck(key)
    est = (f"{_ALPHA} * {HLL_M} * {HLL_M}"
           f" / (sum_set + ({HLL_M} - n_registers_set))")
    return f"""
    WITH regs AS (
      SELECT ({h}) % {HLL_M} AS bucket,
             MAX(CASE WHEN ({h}) // {HLL_M} = 0 THEN 25
                 ELSE 25 - length(bin(({h}) // {HLL_M})) END) AS m_j
      FROM {table} GROUP BY 1
    ),
    est AS (
      SELECT COUNT(*) AS n_registers_set,
             SUM(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << CAST(m_j AS INT)))
               AS sum_set
      FROM regs
    ),
    vals AS (
      SELECT (SELECT COUNT(DISTINCT {key}) FROM {table}) AS n_exact,
             {round6u_sql(est)} AS hll_raw6, n_registers_set
      FROM est
    )
    SELECT CAST(n_exact AS BIGINT) AS n_exact, hll_raw6,
           {round6u_sql("abs(hll_raw6 - n_exact) / n_exact")}
             AS rel_err6,
           CAST(n_registers_set AS BIGINT) AS n_registers_set
    FROM vals
    """


__all__ = ["hll_estimate", "hll_estimate_sql", "HLL_M"]


def hll_merge_check(df: DataFrame, key_col: str,
                    part_col: str) -> DataFrame:
    """One row: (n_parts, merged_raw6, global_raw6, merge_exact) — the
    MERGEABILITY certificate: registers built independently per
    ``part_col`` shard fold by per-bucket MAX into exactly the
    whole-corpus sketch (max of maxes = max), so the merged estimate
    EQUALS the global one. This is why HLL distributes: every
    executor/shard/day sketches alone and the union costs one m-row
    reduce — no raw keys ever meet."""
    h = _h32_spark(key_col)
    rho = (f"CASE WHEN ({h}) div {HLL_M} = 0 THEN 25"
           f" ELSE 25 - length(bin(({h}) div {HLL_M})) END")
    per_part = (df.select(F.col(part_col).alias("part"),
                          F.expr(f"({h}) % {HLL_M}").alias("bucket"),
                          F.expr(rho).alias("rho"))
                .groupBy("part", "bucket")
                .agg(F.max("rho").alias("m_j")))
    merged = per_part.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    glob = (df.select(F.expr(f"({h}) % {HLL_M}").alias("bucket"),
                      F.expr(rho).alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("m_j")))

    def estimate(regs: DataFrame, name: str) -> DataFrame:
        est = regs.agg(
            F.count(F.lit(1)).alias("nset"),
            F.sum(F.expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS"
                         " BIGINT), CAST(m_j AS INT))")).alias("ss"))
        return est.select(round6u(F.expr(
            f"{_ALPHA} * {HLL_M} * {HLL_M}"
            f" / (ss + ({HLL_M} - nset))")).alias(name))

    n_parts = df.agg(F.countDistinct(part_col).alias("n_parts"))
    return (n_parts
            .crossJoin(estimate(merged, "merged_raw6"))
            .crossJoin(estimate(glob, "global_raw6"))
            .select("n_parts", "merged_raw6", "global_raw6",
                    (F.col("merged_raw6") == F.col("global_raw6"))
                    .alias("merge_exact")))


def hll_merge_check_sql(table: str, key: str, part: str) -> str:
    """DuckDB oracle for :func:`hll_merge_check`."""
    h = _h32_duck(key)
    rho = (f"CASE WHEN ({h}) // {HLL_M} = 0 THEN 25"
           f" ELSE 25 - length(bin(({h}) // {HLL_M})) END")
    est = (f"{_ALPHA} * {HLL_M} * {HLL_M}"
           f" / (ss + ({HLL_M} - nset))")
    return f"""
    WITH per_part AS (
      SELECT {part} AS part, ({h}) % {HLL_M} AS bucket,
             MAX({rho}) AS m_j
      FROM {table} GROUP BY 1, 2
    ),
    merged AS (SELECT bucket, MAX(m_j) AS m_j FROM per_part GROUP BY 1),
    whole AS (SELECT ({h}) % {HLL_M} AS bucket, MAX({rho}) AS m_j
              FROM {table} GROUP BY 1),
    em AS (SELECT COUNT(*) AS nset,
                  SUM(CAST(1 AS DOUBLE)
                      / (CAST(1 AS BIGINT) << CAST(m_j AS INT))) AS ss
           FROM merged),
    eg AS (SELECT COUNT(*) AS nset,
                  SUM(CAST(1 AS DOUBLE)
                      / (CAST(1 AS BIGINT) << CAST(m_j AS INT))) AS ss
           FROM whole),
    np AS (SELECT COUNT(DISTINCT {part}) AS n_parts FROM {table})
    SELECT CAST(np.n_parts AS BIGINT) AS n_parts,
           (SELECT {round6u_sql(est)} FROM em) AS merged_raw6,
           (SELECT {round6u_sql(est)} FROM eg) AS global_raw6,
           (SELECT {round6u_sql(est)} FROM em)
             = (SELECT {round6u_sql(est)} FROM eg) AS merge_exact
    FROM np
    """
