"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_ender_turing_spark``; this file only adapts
the engine's query catalog to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_ender_turing_spark.plans import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-way join + agg
    (broadcast dims, decimal-exact sums) — q5_revenue_by_nation."""
    return CATALOG["q5_revenue_by_nation"].builder(spark, "/root/testdata/sf0.001")


# The driver verifies queries in dict order and stops at a budget cutoff
# (round 2: first 50 of 61). Surface queries with no green certification yet
# FIRST, so a cutoff lands on already-proven ones instead of leaving the
# newest operators as unverified claims.
_VERIFY_FIRST: tuple[str, ...] = (
    # never driver-certified (registered past round 2's cutoff), cheapest
    # first so a TIME-based cutoff also gets through them
    "q_sample_stratified", "q_data_mixture", "q_token_budget",
    "q_dedup_multi_signal", "q_embed_quantize", "q_pii_redact",
    "q_multimodal_features", "q_fingerprint", "q_chunk_documents",
    "q_pack_sequences", "q_tfidf_top_terms",
    # fixed this round (NTZ timestamp bug) — need re-certification
    "q_event_lag_chain", "q_sessionize_events",
    # new this round (cheap batch queries)
    "q_dedup_normalized", "q_boilerplate_ngrams", "q_corpus_stats",
    "q_quality_gate_percentile", "q_value_histogram", "q_data_profile",
    "q_token_rarity", "q_range_join_attribution", "q_knn_graph",
    "q_embed_outliers", "q_incremental_dedup", "q_training_set",
    "q_semdedup_keep",
    # streaming (run a full availableNow stream each — the slowest; keep
    # them last inside the priority block)
    "q_stream_hourly_counts", "q_stream_session_windows",
    "q_stream_quality_gate",
)


def _ordered() -> list[str]:
    first = [n for n in _VERIFY_FIRST if n in CATALOG]
    return first + [n for n in CATALOG if n not in _VERIFY_FIRST]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: CATALOG[name].builder for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops
    → driver records a weaker rows-only check)."""
    return {name: CATALOG[name].oracle for name in _ordered()
            if CATALOG[name].oracle is not None}
