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
import hadoopxmlextractor_spark.queries_docs  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_ext  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r8  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r9  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r10  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r11  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r12  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r13  # noqa: F401  (registers queries)
import hadoopxmlextractor_spark.queries_r14  # noqa: F401  (registers queries)
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
    # round-13 rotation: the 17 new r13 operators first, then the
    # queries whose code paths CHANGED this round — source_xls_cells
    # (parser rewritten for the BIFF8 surface), source_doc_text /
    # source_ppt_text (doc extract path restructured for piece
    # tables + decryption), archive_7z_meta + pipeline_7z_documents
    # (PackPos + pack/folder validation), source_pdf_encrypted (+
    # metadata twin — /Length anchoring, keylen fallback),
    # text_robots_admission (robots module grew the crawl-delay/
    # multi-host surface), pipeline_frontier_expand/schedule (reused
    # by the politeness capstone), multimodal_image_orientation_dedup
    # (lossless twin of the new lossy arm) — so the driver
    # re-certifies every touched surface.
    "pipeline_protected_documents",
    "archive_cfb_properties",
    "source_ppt_notes",
    "archive_7z_encoded",
    "archive_zip_encrypted",
    "pipeline_frontier_incremental",
    "source_doc_fields",
    "archive_cfb_meta",
    "source_xls_multisheet",
    "source_ooxml_encrypted",
    "source_docx_text",  # document_text zip routing refactored r13
    "source_doc97_text",
    "source_xls_biff8_full",
    "source_pdf_aesv3",
    "source_xls_encrypted",
    "source_doc_encrypted",
    "pipeline_frontier_polite",
    "multimodal_audio_mp1_subbands",
    "multimodal_image_orientation_lossy",
    "source_xls_cells",
    "source_doc_text",
    "source_ppt_text",
    "archive_7z_meta",
    "pipeline_7z_documents",
    "source_pdf_encrypted",
    "source_pdf_encrypted_metadata",
    "text_robots_admission",
    "pipeline_frontier_expand",
    "pipeline_frontier_schedule",
    "multimodal_image_orientation_dedup",
    "multimodal_audio_mp3_frames",
    # round-12 rotation: the 6 new r12 operators, then the queries
    # whose code paths CHANGED this round — source_pdf_encrypted
    # (R2/R3/R4 arms + enc_rev), pipeline_mbox_attachments (RFC 5987
    # fallback), pipeline_crawl_robots_meta (multi-meta union),
    # archive_zip64_meta (validated EOCD scan) — so the driver
    # re-certifies every touched surface. Cumulative certification
    # already covers the full registry (348/348 at r11).
    "multimodal_audio_mp3_frames",
    "source_pdf_encrypted_metadata",
    "pipeline_wat_writer",
    "text_main_content",
    "text_script_detect",
    "text_nfc_dedup",
    "pipeline_crawl_anchor_text",
    "pipeline_anchor_text_index",
    "pipeline_crawl_outlinks",
    "pipeline_crawl_link_graph",
    "source_rtf_text",
    "multimodal_image_orientation_dedup",
    "archive_7z_meta",
    "pipeline_7z_documents",
    "pipeline_frontier_expand",
    "pipeline_frontier_schedule",
    "archive_cfb_meta",
    "source_doc_text",
    "source_xls_cells",
    "source_ppt_text",
    "source_pdf_encrypted",
    "pipeline_mbox_attachments",
    "pipeline_crawl_robots_meta",
    "archive_zip64_meta",
    "multimodal_audio_mp3_meta",  # r12: router fallback arm landed
    # round-11 rotation (r10 verdict item 9): the cumulative driver
    # ledger covers 328/334; the 6 round-10 additions below were
    # verified locally but never driver-sampled — front-load them so
    # CORRECTNESS_r11.json closes certification at the full registry.
    # New round-11 queries are prepended above this block as they land.
    "source_warc_charset",
    "archive_zip64_meta",
    "source_odf_text",
    "source_ods_cells",
    "source_odf_metadata",
    "pipeline_mbox_attachments",
    "source_subtitle_ass",
    "pipeline_audio_cover_art",
    "pipeline_crawl_robots_meta",
    "pipeline_wet_writer",
    "source_pdf_encrypted",
    "multimodal_image_exif",
    "multimodal_audio_alac_decode",
    "multimodal_audio_alac_hires",
    "multimodal_audio_flac_decode",
    "pipeline_cdx_ranged_fetch",
    "pipeline_crawl_to_markdown",
    "source_cdx_index",
    "source_wikipedia_multistream",
    "text_html_markdown",
    # round-9 rotation (r8 verdict item 1): CORRECTNESS_r08.json came
    # back 50/50 green, so the cumulative hash_match union over
    # CORRECTNESS_r0{1..8}.json certifies 291/298 registry names. The
    # only 7 without a green driver row are the post-cap round-8
    # additions below — front-loading them completes certification of
    # the FULL registry. New round-9 queries are prepended above that
    # block as they land (30 new + 7 post-cap = 37, inside the
    # driver's 50-query sample). Ordering is presentation-only: every
    # entry still runs in the local full-registry gate.
    # --- new round-9 operators ---
    "source_pdf_text",
    "source_docx_text",
    "source_epub_text",
    "source_xlsx_cells",
    "source_pptx_text",
    "pipeline_documents_to_corpus",
    "multimodal_audio_id3_tags",
    "pipeline_feeds_to_frontier",
    "source_latex_text",
    "text_html_metadata",
    "text_html_tables",
    "source_mbox_emails",
    "source_code_features",
    "pipeline_subtitles_to_shots",
    "source_mbox_threads",
    "source_notebook_cells",
    "source_stackexchange_posts",
    "pipeline_stackexchange_qa",
    "source_wikipedia_pages",
    "source_pdf_metadata",
    "source_epub_metadata",
    "archive_zip_meta",
    "archive_tar_meta",
    "source_subtitle_cues",
    "source_feed_entries",
    "multimodal_webp_lossless_ahash",
    "multimodal_video_mp4_meta",
    "multimodal_video_webm_meta",
    "multimodal_image_webp_meta",
    "multimodal_audio_m4a_meta",
    # --- post-cap round-8 queries, never driver-sampled (7) ---
    "corpus_ccnet_buckets",
    "multimodal_audio_oggflac_meta",
    "multimodal_audio_wav_meta",
    "multimodal_video_meta",
    "pipeline_crawl_to_corpus",
    "source_warc_revisit",
    "text_mojibake_repair",
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
