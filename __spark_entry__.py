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
    # --- round-7 order (VERDICT r6 'Next round' #1): brand-new queries
    # with NO driver proof first, then the 3 serving variants that have
    # NEVER had a driver row (judge-sweep-green but the contract metric
    # is CORRECTNESS), then queries whose VALUES changed this round,
    # then the oldest-stale rotation ---
    "q_span_dedup_rewrite", "q_image_phash", "q_image_neardup",
    "q_unigram_lm_vocab", "q_unigram_encode", "q_image_dup_clusters",
    "q_unigram_fertility", "q_image_stats", "q_warc_records",
    "q_warc_domain_stats", "q_stream_image_gate", "q_audio_stats",
    "q_video_meta", "q_text_hash_embed", "q_text_embed_neighbors",
    "q_dsir_model", "q_lm_from_counts", "q_dsir_from_model",
    # genuinely changed in round 7: crawl_budget was de-globalized with
    # max-normalized weights (new weight6 values); the web-curation
    # oracle derives its dedup keep rule instead of the even-id
    # shortcut; q1's decimal-sum spelling was re-shaped (values
    # identical, plan changed)
    "q_crawl_budget", "q_web_curation_pipeline", "q1_pricing_summary",
    # oldest streaming stale (deliberately bumped at position 51 in r6)
    "q_stream_quality_gate",
    # --- newest green row is ROUND 3 (26 remaining): clear the r3 tier
    # entirely this round; cheapest first, streaming last ---
    "q_grouping_sets_mixed",
    "q_cube_distinct_callers", "q_conform_drift", "q_approx_sketches",
    "q_percentile_prices", "q_union_default_region", "q_dsl_filter_events",
    "q_range_join_attribution", "q_value_histogram", "q_data_profile",
    "q_sample_stratified", "q_data_mixture", "q_token_budget",
    "q_pii_redact", "q_fingerprint", "q_chunk_documents",
    "q_pack_sequences", "q_tfidf_top_terms", "q_dedup_normalized",
    "q_boilerplate_ngrams", "q_training_set", "q_quality_gate_percentile",
    "q_corpus_stats", "q_token_rarity",
    "q_stream_hourly_counts", "q_stream_session_windows",
    # media_meta's JPEG marker scan changed in r7 (fill bytes +
    # standalone markers) but the planted fixture exercises neither, so
    # its r6 proof stands in substance — re-certify after the r3 tier
    # rather than ahead of three-round-stale rows
    "q_media_meta",
    # --- newest green row is ROUND 4 (50 queries): the ~50-row budget
    # cutoff lands in here (~position 42 onward); whatever it reaches
    # gets refreshed, the rest rotate in r8 ---
    "q_sessionize_events", "q_scd2_intervals", "q_unpivot_metrics",
    "q_sliding_window_counts", "q_date_spine_orders", "q_json_extract_props",
    "q_hourly_anomalies", "q_equidepth_histogram", "q_funnel_conversion",
    "q_cohort_retention", "q_funnel_windowed", "q_chi_square_lang_source",
    "q_k_anonymity", "q_constraint_audit", "q_stats_moments",
    "q_minhash_estimate_error", "q_lsh_recall_check", "q_dedup_containment",
    "q_dup_cluster_stats", "q_dedup_keep_best", "q_ann_recall_check",
    "q_compressed_ann_recall", "q_embed_matryoshka_topk",
    "q_embed_binary_topk", "q_embed_ivf_kmeans", "q_embed_quantize",
    "q_train_val_test_split", "q_temperature_mixture", "q_bigram_coherence",
    "q_bm25_topk", "q_hybrid_rrf", "q_bm25_from_index",
    "q_embed_ivf_from_index", "q_cross_source_dups", "q_embed_pq_codes",
    "q_embed_pq_topk", "q_embed_ann_multiprobe", "q_kmeans_one_step",
    "q_group_token_budget", "q_dedup_prefix_jaccard",
    "q_incremental_dedup_verified", "q_gopher_rules", "q_source_head_cap",
    "q_weighted_sample", "q_span_dedup_stats", "q_quality_classifier",
    "q_stream_sliding_counts", "q_stream_enriched_segments",
    "q_stream_click_attribution",
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
