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
