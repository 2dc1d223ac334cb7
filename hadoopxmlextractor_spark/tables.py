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
        # events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces it
        # depends on the Spark version, so adapt to whatever the reader
        # actually produced instead of assuming one representation:
        #   - older Spark + nanosAsLong: raw int64 nanoseconds (bigint) →
        #     truncate to microseconds (same truncation DuckDB applies
        #     casting TIMESTAMP_NS → TIMESTAMP, so oracles agree)
        #   - Spark 4.x: native timestamp_ntz → cast to session-tz
        #     timestamp; pin the session timezone to UTC first so the
        #     NTZ→LTZ conversion is the identity and can never diverge
        #     from DuckDB's tz-naive truncation on a non-UTC host.
        try:
            # tolerated-but-ignored on Spark 4.x (native TIMESTAMP_NS
            # support); needed on older Spark to read nanos at all. A
            # future Spark that REMOVES the legacy key would throw —
            # the adaptive dtype dispatch below works either way, so
            # never let the conf call itself be the failure.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
