#!/usr/bin/env python
"""End-to-end training-data pipeline demo over the synthetic corpus:

  documents
    → quality filter (Gopher-style rules, scan-bandwidth)
    → exact dedup (md5 hash-groupBy)
    → MinHash+LSH near-dup pairs → connected components → keep one
      canonical doc per cluster
    → k-means semantic diversity cap (≤40 docs per embedding cluster)
    → stable train/val split (md5 bucket — no sampling job)
    → context-window chunks
    → Hive-partitioned parquet output (split=train/val directories)

Every stage is an operator from ``hadoopxmlextractor_spark.operators``
with its own oracle-checked registry query; this script shows them
composed the way a corpus build would run them at scale.

Usage: PYTHONPATH=. python scripts/run_corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.corpus import (
    chunk_documents,
    quality_filter,
    train_val_split,
)
from hadoopxmlextractor_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    dedup_minhash_lsh,
)
from hadoopxmlextractor_spark.sinks import write_partitioned_parquet
from hadoopxmlextractor_spark.tables import load


def build_corpus(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. Rule-based quality filter (no shuffle).
    kept = (
        quality_filter(docs, "text", "doc_id")
        .filter(F.col("keep"))
        .select("doc_id")
        .join(docs, "doc_id")
    )

    # 2. Exact dedup: first doc per md5(text).
    exact = dedup_exact(kept, "text", "doc_id").select("doc_id").join(kept, "doc_id")
    exact = exact.persist()
    n_exact = exact.count()  # eager: feeds LSH pairs AND the anti-join below

    # 3. Near-dup removal: LSH candidate pairs → clusters → drop
    #    non-canonical members.
    pairs = dedup_minhash_lsh(
        exact, "text", "doc_id", num_hashes=64, bands=32, threshold=0.5
    ).select("doc_a", "doc_b")
    losers = connected_components(pairs).filter(~F.col("is_canonical")).select("doc_id")
    unique = exact.join(losers, "doc_id", "left_anti")

    # 3b. Semantic diversity cap: k-means over the embedding table,
    #     keep at most 40 docs per semantic cluster (SemDeDup-style —
    #     stops any one mode from dominating the mix). Embeddings are
    #     keyed by the same ids as documents.
    from pyspark.sql import Window

    from hadoopxmlextractor_spark.operators.similarity import kmeans_assignments

    emb = load(spark, sf_dir, "embeddings")
    assign = kmeans_assignments(emb, k=8, rounds=2)
    cap_w = Window.partitionBy("centroid_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    diverse_ids = (
        assign.withColumn("r", F.row_number().over(cap_w))
        .filter(F.col("r") <= 40)
        .select(F.col("vec_id").alias("doc_id"))
    )
    unique = unique.join(diverse_ids, "doc_id", "left_semi")

    # 4. Deterministic split + context-window chunks.
    split = train_val_split(unique, "doc_id", val_pct=10).select("doc_id", "split")
    chunks = chunk_documents(unique, "text", "doc_id", chunk_tokens=128)
    final = chunks.join(split, "doc_id")

    # 5. Partitioned layout: split=train / split=val directories.
    write_partitioned_parquet(final, out_dir, ["split"])

    out = spark.read.parquet(out_dir)
    stats = {
        "raw_docs": n_raw,
        "after_quality": kept.count(),
        "after_exact_dedup": n_exact,
        "after_near_dedup": unique.count(),
        "semantic_clusters": assign.select("centroid_id").distinct().count(),
        "chunks_train": out.filter(F.col("split") == "train").count(),
        "chunks_val": out.filter(F.col("split") == "val").count(),
    }
    exact.unpersist()
    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_out_")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("corpus-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stats = build_corpus(spark, sf_dir, out_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")
    print(f"output: {out_dir}")


if __name__ == "__main__":
    main()
