"""Cross-engine-stable 6dp rounding for small-integer rationals.

``ROUND(x, 6)`` disagrees between engines when x lands EXACTLY on the
6dp halfway point (Spark rounds half-up, DuckDB half-even on doubles) —
and ratios of small integers DO land there: the first observed case was
cume_dist = 333/640 = 0.5203125 at sf0.1. Every ratio-of-counts output
in the repo goes through these helpers instead; floor(x·1e6 + 0.5)/1e6
evaluates as the same IEEE double sequence in both engines.

Only for NON-NEGATIVE x (all repo ratios are); for signed values with no
exact-halfway risk (cosines, ln-scores), plain round(·, 6) stays.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round6u(c: Column) -> Column:
    """Half-up 6dp rounding of a non-negative double column."""
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000


def round6u_sql(expr: str) -> str:
    return f"FLOOR(({expr}) * 1000000 + 0.5) / 1000000"


def round6s(c: Column) -> Column:
    """Sign-aware half-away-from-zero 6dp rounding: the :func:`round6u`
    IEEE-identical spelling extended to signed values (order-sensitive
    recurrence outputs like Holt level/trend can be negative). Spelled
    as a CASE, not SIGN(x)·… — Java signum(-0.0) is -0.0 while DuckDB's
    is 0, which would leak a -0.0 into one engine's hash only."""
    pos = F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000
    neg = -(F.floor(-c * 1_000_000 + F.lit(0.5)) / 1_000_000)
    # + 0.0 folds any -0.0 (tiny negatives round to zero through the
    # negative branch) to plain 0.0 — exact for every other value
    return F.when(c < 0, neg).otherwise(pos) + F.lit(0.0)


def round6s_sql(expr: str) -> str:
    return (f"(CASE WHEN ({expr}) < 0"
            f" THEN -(FLOOR(-({expr}) * 1000000 + 0.5) / 1000000)"
            f" ELSE FLOOR(({expr}) * 1000000 + 0.5) / 1000000 END"
            f" + CAST(0 AS DOUBLE))")
