"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``hadoopxmlextractor_spark.queries`` (relational
surface) and ``hadoopxmlextractor_spark.operators`` (dedup, similarity,
text analysis); this module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import hadoopxmlextractor_spark.corpus_queries  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.events_queries  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.flagship_queries  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.pipeline_queries  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_ext  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.tpch_queries  # noqa: F401  (registers queries)
from hadoopxmlextractor_spark.queries import ORACLE, QUERIES
from hadoopxmlextractor_spark.tables import load


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation and
    order-year across the full join tree (region→nation→customer→orders
    →lineitem), exercising broadcast joins, a shuffle join, partial
    aggregation, and window ranking in one plan."""
    sf = "/root/testdata/sf0.001"
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")

    from pyspark.sql import Window

    revenue = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,2)"
                )
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = Window.partitionBy("r_name", "order_year").orderBy(F.col("revenue").desc())
    return revenue.withColumn("rank_in_region", F.row_number().over(w))


# Registry-order rotation: the driver's correctness sample takes the
# FIRST 50 registry entries, so the front of this list decides what
# gets a driver-ledger row this round.
FRONT = [
    # round-5 NEW operators first (never-certified by definition):
    "dedup_prefix_filter_join",
    "events_debounce",
    "dedup_clusters_incremental",
    "corpus_incremental_minmax",
    "events_sessionize_incremental",
    "diagnostics_join_cardinality",
    "events_incremental_topk",
    "corpus_curriculum_order",
    "corpus_distribution_drift",
    "events_session_revenue",
    "events_funnel_windowed",
    "events_asof_state_enrichment",
    "diagnostics_referential_integrity",
    "corpus_paragraph_dedup",
    "text_tfidf_topk",
    "similarity_maxsim_multivector",
    "similarity_mmr_topk",
    "dedup_shared_substring_runs",
    "governance_forget_audit",
    # round-5 rotation (verdict item 2): every entry below has NO
    # driver-ledger green row across r1-r4 (computed from the
    # CORRECTNESS_r0*.json ledgers); the driver samples the first 50,
    # so each round certifies 50 first-time queries until the whole
    # registry has been driver-green at least once (~140 remaining at
    # r5 start -> done by r7). Guard-affected exact-ngram consumers
    # (dedup_ngram_containment, dedup_survivors_authority,
    # dedup_minhash_lsh) are pinned inside the first 50. Ordering is
    # presentation-only: every entry still runs in the local
    # full-registry gate (scripts/check_correctness.py).
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_simhash",
    "q18_large_orders",
    "corpus_length_buckets",
    "corpus_tokenize_ids",
    "corpus_bigram_logprob",
    "corpus_contamination_score",
    "corpus_source_quality",
    "dedup_cluster_sizes",
    "corpus_chunk_text",
    "corpus_pack_chunks",
    "dedup_survivors",
    "corpus_upsert",
    "corpus_profile",
    "dedup_graph_triangles",
    "corpus_chunks_overlap",
    "corpus_contrastive_pairs",
    "dedup_clusters_stars",
    "dedup_graph_pagerank",
    "corpus_bpe_merges",
    "corpus_bpe_encode",
    "corpus_pipeline_from_config",
    "corpus_data_contract",
    "corpus_concentration",
    "dedup_survivors_authority",
    "corpus_dedup_report",
    "corpus_soft_quality_sample",
    "corpus_semantic_leakage",
    "corpus_line_filter",
    "corpus_leakage_free_split",
    "corpus_token_budget_plan",
    "corpus_hard_negatives",
    "corpus_chunk_language",
    "events_hopping_window",
    "events_retention",
    "events_funnel",
    "agg_salted_hot_keys",
    "events_zscore_topk",
    "events_mad_outliers",
    "join_salted_hot_keys",
    "events_markov_transitions",
    "events_attribution",
    "events_trend_slope",
    # --- driver sample boundary (first 50 above) ---
    "events_twap",
    "agg_hll_daily_merge",
    "events_association_rules",
    "events_scd2_history",
    "events_ewma_spikes",
    "join_asof_cogroup",
    "events_pit_training_features",
    "events_gap_fill",
    "agg_quantile_sketch_merge",
    "events_rolling_wau",
    "events_ab_cuped",
    "events_interval_merge",
    "events_sequence_motif",
    "events_churn_labels",
    "diagnostics_key_skew",
    "events_funnel_trend",
    "events_cohort_triangle",
    "events_rfm_scores",
    "events_ab_srm_check",
    "events_bot_detection",
    "events_seasonality_profile",
    "events_stickiness",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "sql_interface_segment_share",
    "q22_sales_opportunity",
    "sql_lateral_topk",
    "sql_recursive_date_spine",
    "minhash_signatures",
    "embedding_near_pairs_lsh",
    "text_winnowing",
    "multimodal_features",
    "text_repetition",
    "similarity_range_search",
    "dedup_fuzzy_names",
    "text_pii_audit",
    "dedup_window_profile",
    "corpus_source_overlap",
    "text_heavy_hitters",
    "text_hashed_features",
    "similarity_topk_filtered",
    "dedup_minhash_incremental",
    "embedding_quantize_int8",
    "similarity_knn_classify",
    "text_quality_classifier",
    "multimodal_image_ahash",
    "multimodal_audio_energy",
    "multimodal_video_shots",
    "text_url_blocklist",
    "search_hybrid_rrf",
    "governance_k_anonymity",
    "multimodal_image_neardup",
    "embedding_data_contract",
    "governance_masked_export",
    "text_cjk_accounting",
    "agg_stats",
    "scalar_string_ext",
    "scalar_date_ext",
    "udaf_grouped_pandas",
    "udtf_sentence_split",
    "sort_limit_offset",
    "distinct_projection",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "null_semantics",
    "array_hof_stats",
    "map_functions",
    "union_by_name_missing",
    "q4_order_priority",
    "q10_returned_items",
    "q13_customer_distribution",
    "agg_order_stats",
    "agg_value_histogram",
    "scalar_try_safe",
    "set_intersect_all",
    "set_except_all",
    "sql_unpivot",
    "agg_trimmed_mean",
    "agg_mode",
    "scalar_variant",
    "agg_corr_matrix",
    "scalar_bitwise",
    "scalar_regex_family",
    "agg_grouping_id",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_shipping",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q20_part_promotion",
    "q21_waiting_supplier",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    newest/riskiest queries rotated to the front of the iteration
    order (see FRONT)."""
    ordered = {n: QUERIES[n] for n in FRONT if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted entries get the
    driver's weaker rows-only check)."""
    return dict(ORACLE)
