"""Table loading for the analytics surface (driver testdata layout).

All queries read the parquet tables lazily so Catalyst can push filters
and prune columns into the scan (verify with
``df.explain()`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw
        # int64 nanoseconds and truncate to Spark's native microsecond
        # timestamps (same truncation DuckDB applies casting
        # TIMESTAMP_NS → TIMESTAMP, so oracles agree). Runtime-settable,
        # so it works under any driver-created session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
