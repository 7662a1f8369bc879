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
# (~50 queries). Surface queries with no green certification yet FIRST, so
# a cutoff lands on already-proven ones instead of leaving the newest
# operators as unverified claims.
_VERIFY_FIRST: tuple[str, ...] = (
    # --- never driver-certified: new in round 5 ---
    "q_media_meta", "q_char_entropy", "q_zipf_slope",
    "q_snapshot_diff", "q_dedup_consecutive",
    "q_url_parse", "q_domain_stats", "q_domain_blocklist", "q_url_dedup",
    "q_ccnet_buckets",
    # --- newest green row is ROUND 2 (24 queries, oldest proofs first;
    # all re-verified green locally in r4/r5 — this refreshes the
    # driver's own record) ---
    "q_scalar_functions", "q_pivot_event_types", "q_set_intersect_except",
    "q_count_pushdown", "q_explode_part_tokens", "q_dedup_exact",
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_simhash_pairs",
    "q_dedup_ngram_jaccard", "q_dedup_lsh_jaccard", "q_dup_clusters",
    "q_dedup_keep_canonical", "q_dedup_embed_cosine", "q_embed_cosine_topk",
    "q_embed_lsh_buckets", "q_embed_ivf_cells", "q_embed_ivf_topk",
    "q_embed_ann_lsh_topk", "q_text_quality", "q_lang_id", "q_token_count",
    "q_repetition_signals", "q_decontaminate",
    # --- newest green row is ROUND 3: queries whose code changed in
    # round 5 lead (broadcast-hint drop, two-phase top-k pin, pinned
    # fixed-k args, shared verified-pair fixture) ---
    "q5_revenue_by_nation", "q_topk_orders_per_segment", "q_semdedup_keep",
    "q_knn_graph", "q_embed_outliers", "q_dedup_multi_signal",
    "q_incremental_dedup", "q_multimodal_features",
    # --- remaining round-3 rows, cheapest first; a budget cutoff lands
    # here and leaves nothing older than r3 ---
    "q1_pricing_summary", "q2_filter_projection", "q_semi_join_reviewed",
    "q_anti_join_no_orders", "q_rolling_30d_window", "q_rank_battery",
    "q_dedup_latest_event", "q_event_lag_chain", "q_asof_prev_purchase",
    "q_hourly_event_rollup", "q_rollup_order_status",
    "q_skew_salted_distinct", "q_grouping_sets_mixed",
    "q_cube_distinct_callers", "q_conform_drift", "q_approx_sketches",
    "q_percentile_prices", "q_union_default_region", "q_dsl_filter_events",
    "q_range_join_attribution", "q_value_histogram", "q_data_profile",
    "q_sample_stratified", "q_data_mixture", "q_token_budget",
    "q_pii_redact", "q_fingerprint", "q_chunk_documents",
    "q_pack_sequences", "q_tfidf_top_terms", "q_dedup_normalized",
    "q_boilerplate_ngrams", "q_training_set", "q_quality_gate_percentile",
    "q_corpus_stats", "q_token_rarity",
    # streaming r3 rows last in the stale block (each runs a full
    # availableNow stream — the most expensive rows per proof)
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
