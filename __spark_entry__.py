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
import hadoopxmlextractor_spark.queries_r8  # noqa: F401  (registers queries)
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
    # round-8 rotation (r7 verdict item 1): the 33 registry names with
    # no green driver CORRECTNESS row across r01-r07 (31 never sampled
    # plus multimodal_features / text_winnowing, whose only driver rows
    # are r01/r02 reds — both re-verified green locally since).
    # Regenerated from the hash_match union of CORRECTNESS_r0{1..7}.json
    # vs the registry. New round-8 queries are prepended above this
    # block as they land; the driver samples the first 50, so the new-
    # query count stays <= 17 to keep all 33 inside the sample and
    # complete certification of the full registry this round. Ordering
    # is presentation-only: every entry still runs in the local
    # full-registry gate.
    # --- new round-8 operators (16 = the cap: 16 + 33 never-certified
    # fills 49 of the driver's 50-query sample) ---
    "text_robots_admission",
    "source_sitemap_urls",
    "multimodal_audio_opus_meta",
    "multimodal_jpeg_lossless_ahash",
    "multimodal_video_rle_shots",
    "multimodal_png_lowbit_ahash",
    "source_warc_split",
    "multimodal_audio_mp3_meta",
    "multimodal_audio_vorbis_meta",
    "join_auto_salt",
    "multimodal_audio_flac_meta",
    "corpus_minhash_semantic_scope",
    "text_simhash_hamming_buckets",
    "source_warc_wet_pipeline",
    "events_count_distinct_sliding",
    "text_language_confidence",
    # --- never driver-certified across r01-r07 (33) ---
    "multimodal_features",
    "text_winnowing",
    "multimodal_image_ahash",
    "multimodal_image_neardup",
    "multimodal_video_shots",
    "null_semantics",
    "scalar_bitwise",
    "scalar_date_ext",
    "scalar_regex_family",
    "scalar_string_ext",
    "scalar_try_safe",
    "scalar_variant",
    "search_hybrid_rrf",
    "set_except_all",
    "set_intersect_all",
    "similarity_knn_classify",
    "similarity_range_search",
    "similarity_topk_filtered",
    "sort_limit_offset",
    "sql_interface_segment_share",
    "sql_lateral_topk",
    "sql_recursive_date_spine",
    "sql_unpivot",
    "text_cjk_accounting",
    "text_hashed_features",
    "text_heavy_hitters",
    "text_pii_audit",
    "text_quality_classifier",
    "text_repetition",
    "text_url_blocklist",
    "udaf_grouped_pandas",
    "udtf_sentence_split",
    "union_by_name_missing",
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
