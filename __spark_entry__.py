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
    # --- round-10 consolidation (VERDICT r9 'Next round' #1): drain
    # every r4/r5-stale driver certification before anything else.
    # Genuinely new r10 queries (kept to a handful) lead because they
    # have NO driver proof at all; then the 18 rows whose newest green
    # driver row is ROUND 4, then the 43 ROUND-5 rows, each tier
    # cheapest-first by this round's full-sweep sf0.01 timings; the
    # ROUND-6 tier follows as margin in case the budget exceeds 61.
    # Ledger: QUERIES.md 'driver' column (tools/dump_catalog.py).
    # --- new in round 10 ---
    "q_er_indel_pairs", "q_er_golden_increment",
    # --- plans changed in round 10 (values unchanged, re-certify):
    # the balance-band blocking key added to every ER path ---
    "q_er_candidate_pairs", "q_er_clusters", "q_er_golden_record",
    "q_er_supplier_pairs", "q_er_match_increment", "q_stream_er_gate",
    # --- newest driver row = ROUND 4 (18) ---
    "q_bm25_topk", "q_embed_ann_multiprobe", "q_embed_pq_topk",
    "q_hybrid_rrf", "q_incremental_dedup_verified", "q_bm25_from_index",
    "q_compressed_ann_recall", "q_ann_recall_check", "q_dedup_containment",
    "q_dup_cluster_stats", "q_stream_sliding_counts", "q_dedup_keep_best",
    "q_minhash_estimate_error", "q_dedup_prefix_jaccard",
    "q_embed_ivf_from_index", "q_lsh_recall_check", "q_embed_ivf_kmeans",
    "q_stream_click_attribution",
    # --- newest driver row = ROUND 5 (43) ---
    "q_token_count", "q_count_pushdown", "q_explode_part_tokens",
    "q_embed_lsh_buckets", "q_zipf_slope", "q_dedup_consecutive",
    "q_scalar_functions", "q_snapshot_diff", "q_text_quality",
    "q_multimodal_features", "q_char_entropy", "q2_filter_projection",
    "q_pivot_event_types", "q_knn_graph", "q_embed_ivf_cells",
    "q_incremental_dedup", "q_embed_cosine_topk", "q_anti_join_no_orders",
    "q_repetition_signals", "q_decontaminate", "q_dedup_latest_event",
    "q_embed_outliers", "q_set_intersect_except", "q_embed_ann_lsh_topk",
    "q_dedup_minhash_lsh", "q_semi_join_reviewed", "q_dedup_embed_cosine",
    "q_semdedup_keep", "q_event_lag_chain", "q_embed_ivf_topk",
    "q_rank_battery", "q_topk_orders_per_segment", "q_dedup_lsh_jaccard",
    "q_dedup_exact", "q_dedup_keep_canonical", "q_lang_id",
    "q_rolling_30d_window", "q_dedup_ngram_jaccard", "q_dedup_simhash",
    "q_dup_clusters", "q_dedup_simhash_pairs", "q5_revenue_by_nation",
    "q_dedup_multi_signal",
    # --- margin: newest driver row = ROUND 6 (45) ---
    "q_html_extract", "q_corpus_manifest", "q_shard_balance",
    "q_card_redact", "q_pack_efficiency", "q_url_dedup",
    "q_bpe_pair_counts", "q_sitemap_urls", "q_extract_links",
    "q_url_parse", "q_rollup_order_status", "q_unimax_allocation",
    "q_ngram_lm_counts", "q_hourly_event_rollup", "q_class_tfidf",
    "q_robots_filter", "q_domain_stats", "q_asof_prev_purchase",
    "q_paragraph_dedup", "q_skew_salted_distinct", "q_embed_drift",
    "q_anchor_terms", "q_domain_blocklist", "q_contamination_report",
    "q_margin_mining", "q_dsir_topk", "q_unimax_sample",
    "q_prototype_prune", "q_dsir_weights", "q_stream_source_cap",
    "q_curation_attrition", "q_lm_scores", "q_doremi_step",
    "q_lang_confusion", "q_quality_ensemble", "q_bpe_merges", "q_text_nfc",
    "q_lm_ccnet_gate", "q_stream_neardup_gate", "q_bpe_encode",
    "q_tokenizer_fertility", "q_domain_pagerank", "q_ccnet_buckets",
    "q_llm_training_set", "q_stream_lm_scores",
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
