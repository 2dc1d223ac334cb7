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


# Registry-order rotation (round-3 verdict item 7): the driver's
# correctness sample takes the FIRST 50 registry entries, so the
# newest / most-recently-changed queries are rotated to the front —
# the five round-4 gate-verdict conversions, the sharded-bloom
# addition, the queries whose oracles or cache behavior changed this
# round — followed by one representative per major operator family,
# then everything else in registration order. Ordering is
# presentation-only: every entry still runs in the local full-registry
# gate (scripts/check_correctness.py).
FRONT = [
    # round-4 late additions (binary-quantized ANN tier, KMV sketches,
    # incremental view maintenance, sorted-neighborhood blocking)
    "dedup_sorted_neighborhood",
    "dedup_fuzzy_join",
    "text_url_canonical_dedup",
    "corpus_shard_manifest",
    "corpus_source_divergence",
    "text_countmin_freq",
    "corpus_dsir_sample",
    "embedding_bitext_mine",
    "embedding_binary_quantize",
    "similarity_topk_binary",
    "corpus_kmv_source_overlap",
    "corpus_kmv_cardinality",
    "corpus_incremental_rollup",
    "dedup_graph_hits",
    # round-4 gate-verdict conversions (formerly rows-only)
    "agg_approx_distinct",
    "percentiles_approx",
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    # round-4 additions / oracle or plumbing changes
    "dedup_incremental_bloom_sharded",
    "dedup_incremental_bloom",
    "text_ngram_novelty",
    "text_token_chi2",
    "embedding_knn_graph",
    "embedding_kmeans",
    "embedding_top_pc",
    "corpus_diversity_sample",
    "text_perceptron_weights",
    "text_perceptron_predictions",
    "text_regression_suffstats",
    "embedding_kmeans_profile",
    "similarity_topk_bruteforce",
    # one representative per major family for sample breadth
    "scan_filter_project",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "join_inner_agg",
    "join_broadcast_dim",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_range",
    "join_asof",
    "join_interval_overlap",
    "window_topk_per_group",
    "window_running_sum",
    "topk_global",
    "set_union",
    "set_except",
    "scalar_string",
    "scalar_date",
    "scalar_json",
    "array_explode",
    "subquery_scalar",
    "subquery_in",
    "pivot_event_counts",
    "events_tumbling_window",
    "events_sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "corpus_prepare_training_data",
    "corpus_decontaminate",
    "q18_large_orders",
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
