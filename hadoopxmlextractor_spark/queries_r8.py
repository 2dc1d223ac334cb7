"""Round-8 queries: intra-file WARC splits, crawled-audio metadata
(MP3 / Ogg Vorbis / FLAC header walks), skew-adaptive joins, scoped
near-dup, SimHash LSH observability, the WARC→WET composition, sliding
distinct counts, and language-ID confidence.

Registered into the same QUERIES/ORACLE registry as the other query
modules; every entry carries an exact DuckDB oracle. Fresh module per
the r7 verdict (new operators must not churn certified modules).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

# ---------------------------------------------------------------------------
# WARC intra-file splits (r7 verdict item 3)
# ---------------------------------------------------------------------------


@query(
    "source_warc_split",
    """
    WITH bodysum AS (
      SELECT doc_id, k.k AS k,
             CAST(SUM(CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':wsplit:'
                   || CAST(k.k AS VARCHAR) || ':' || CAST(h.h AS VARCHAR)),
               j.j * 2 + 1, 2)) AS BIGINT)) AS BIGINT) AS bsum
      FROM documents,
           (SELECT unnest(range(4)) AS k) k,
           (VALUES (0), (1)) h(h),
           (SELECT unnest(range(16)) AS j) j
      GROUP BY doc_id, k.k
    )
    SELECT doc_id, CAST(k AS INT) AS rec_idx,
           'https://example.com/doc/' || CAST(doc_id AS VARCHAR) || '/'
             || CAST(k AS VARCHAR) AS target_uri,
           CAST(32 AS BIGINT) AS n_payload,
           bsum AS body_sum,
           TRUE AS multi_split
    FROM bodysum
    """,
)
def q_source_warc_split(spark: SparkSession, sf: str) -> DataFrame:
    # The INTRA-FILE split path for few-huge-files WARC corpora
    # (SCALE.md's "re-shard first" caveat converted into code): each
    # doc synthesizes a 4-record WARC (each record its own gzip
    # member, 32-byte md5 body), warc_split_index scans the member
    # offsets ONCE (target 200 compressed bytes, forcing >1 split per
    # file), and warc_records_ranged parses each (offset, length)
    # slice independently with first_rec seeding rec_idx — so the
    # union over splits must be ROW-IDENTICAL to the whole-file read.
    # The oracle replays rec_idx continuity, URIs, payload lengths,
    # and body byte-sums; multi_split pins that the file really was
    # cut (vacuous-check rule — a single-split run proves nothing).
    # Gzip output bytes vary by zlib version, so the oracle pins the
    # >1-split BOOLEAN, never a byte count.
    import hashlib

    from hadoopxmlextractor_spark.sources import warc as W

    docs = load(spark, sf, "documents")

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                recs = [
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:uuid:{i}-{k}>",
                        "target_uri": f"https://example.com/doc/{i}/{k}",
                        "content_type": "text/plain",
                        "payload": (
                            hashlib.md5(f"{i}:wsplit:{k}:0".encode()).digest()
                            + hashlib.md5(f"{i}:wsplit:{k}:1".encode()).digest()
                        ),
                    }
                    for k in range(4)
                ]
                out.append(W.write_warc(recs, gzip_members=True))
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    idx = W.warc_split_index(files, target_bytes=200).filter(
        F.col("split_idx") >= 0
    )
    recs = W.warc_records_ranged(idx.join(files, "path"))
    n_splits = idx.groupBy("path").agg(F.count(F.lit(1)).alias("n_splits"))

    @F.pandas_udf("long")
    def _bytesum(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for payloads in it:
            yield pd.Series(
                [None if p is None else int(sum(bytes(p))) for p in payloads],
                dtype="object",
            )

    return (
        recs.join(F.broadcast(n_splits), "path")
        .select(
            F.col("path").cast("bigint").alias("doc_id"),
            "rec_idx",
            "target_uri",
            F.col("content_length").alias("n_payload"),
            _bytesum("payload").alias("body_sum"),
            (F.col("n_splits") > 1).alias("multi_split"),
        )
    )
