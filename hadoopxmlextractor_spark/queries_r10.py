"""Round-10 queries — real-capture crawl/document realism:

- Wikipedia `.bz2` MULTISTREAM dumps: index-driven record-aligned
  intra-file splits + ranged bz2 decompression (the shape that makes
  the single 20+ GB dump file splittable, mirroring the r8 WARC
  split architecture);
- (r10 continues in this module as further operators land.)

Registered into the same QUERIES/ORACLE registry as the other query
modules; every entry carries an exact DuckDB oracle. Fresh module per
the regression discipline (new operators must not churn certified
modules).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

_MD5B = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), "
    "{pos}, 2)) AS BIGINT)"
)


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)


_W = "(['alpha','bravo','charlie','delta','echo'])"


@query(
    "source_wikipedia_multistream",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('wiki', 0)} AS b0, {_b('wiki', 1)} AS b1,
             {_b('wiki', 2)} AS b2, {_b('wiki', 3)} AS b3,
             {_b('wiki', 4)} AS b4
      FROM documents
    ),
    art AS (
      SELECT doc_id,
             CAST(10 + doc_id % 1000 AS INT) AS page_id,
             'Article ' || CAST(doc_id AS VARCHAR) AS title,
             CAST(CASE WHEN b1 % 2 = 0 THEN 0 ELSE 4 END AS INT) AS ns,
             CAST(NULL AS VARCHAR) AS redirect_to,
             {_W}[b0 % 5 + 1] || ' history The ' || {_W}[(b1 + 1) % 5 + 1]
               || ' is really a ' || {_W}[(b2 + 2) % 5 + 1]
               || ' idea and a plain ' || {_W}[(b3 + 3) % 5 + 1]
               || '. See the ' || {_W}[(b4 + 4) % 5 + 1]
               || ' site for more.' AS text_clean
      FROM p
    ),
    red AS (
      SELECT doc_id,
             CAST(5000 + doc_id % 1000 AS INT) AS page_id,
             'Alias ' || CAST(doc_id AS VARCHAR) AS title,
             CAST(0 AS INT) AS ns,
             'Article ' || CAST(doc_id AS VARCHAR) AS redirect_to,
             '#REDIRECT Article ' || CAST(doc_id AS VARCHAR) AS text_clean
      FROM p WHERE b0 % 3 = 0
    ),
    u AS (SELECT * FROM art UNION ALL SELECT * FROM red)
    SELECT doc_id, page_id, title, ns, redirect_to, text_clean,
           CAST(LENGTH(text_clean)
                - LENGTH(replace(text_clean, ' ', '')) + 1 AS INT)
             AS n_tokens,
           TRUE AS multi_split
    FROM u
    """,
)
def q_source_wikipedia_multistream(spark: SparkSession, sf: str) -> DataFrame:
    # The REAL Wikipedia dump shape (r10): pages-articles-multistream
    # .xml.bz2 is a concatenation of bz2 streams (header stream with
    # <mediawiki><siteinfo>, pages in their own streams, a closing-tag
    # stream) plus the companion offset:page_id:title index — the
    # offsets are what make the single 20+ GB file SPLITTABLE. Each
    # doc synthesizes a dump (one page per stream) + bz2 index;
    # wikipedia_split_index converts the index into record-aligned
    # (offset, length) splits (target 1 byte → one split per stream,
    # so header-only and footer-carrying ranges are both live), and
    # wikipedia_pages_ranged decompresses each range INDEPENDENTLY —
    # the union over splits must be row-identical to the whole-dump
    # parse, which is exactly the source_wikipedia_pages oracle;
    # multi_split pins that every dump really was cut (vacuous-check
    # rule). Same architecture as the r8 WARC intra-file splits.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    files = D.synth_wikipedia_multistream(docs)
    idx = D.wikipedia_split_index(files, target_bytes=1).filter(
        F.col("split_idx") >= 0
    )
    pages = D.wikipedia_pages_ranged(
        idx.join(files, "doc_id").select(
            "doc_id", "content", "offset", "length"
        )
    )
    n_splits = idx.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_splits")
    )
    return pages.join(F.broadcast(n_splits), "doc_id").select(
        "doc_id", "page_id", "title", "ns", "redirect_to", "text_clean",
        "n_tokens", (F.col("n_splits") > 1).alias("multi_split"),
    )
