"""Scan-parallelism normalization for compute-heavy operators.

Spark parallelizes a parquet scan by file and row group; a single
row group is one task no matter how many cores exist. On a real
deployment (the 100 TB case) inputs arrive as thousands of files /
row groups, so scans are naturally wide and ``ensure_min_parallelism``
is a no-op — the guard sees enough partitions and returns the input
unchanged, adding zero exchanges to the plan.

On narrow inputs (one small file, one row group — exactly the local
testdata shape) a CPU-heavy downstream stage (MinHash signatures,
SimHash folds, fragment scanning) would otherwise run on ONE core.
There the one extra round-robin exchange of the raw rows costs far
less than the serialized compute it unlocks.

Use this ONLY in front of genuinely compute-heavy per-row stages;
plain relational queries should keep the scan's native partitioning
so Catalyst/AQE stay in charge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    ``sparkContext.defaultParallelism``) — but ONLY if its current plan
    yields fewer partitions. Wide inputs pass through untouched, so at
    scale this is plan-neutral."""
    if df.isStreaming:
        # Streaming plans have no RDD to probe; micro-batch width is
        # the source's concern (maxFilesPerTrigger etc.), so pass
        # through untouched.
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)
