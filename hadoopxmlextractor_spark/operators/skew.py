"""Skew-handling operators: salting for hot keys, bucketed co-located
joins.

At 100 TB a handful of hot keys (a viral user, an empty-string default)
can pin one reducer for hours. Two standard remedies, both expressed as
plain DataFrame transformations so Catalyst/AQE still optimize around
them:

- **Salted aggregation**: two-phase groupBy — first on (key, salt) to
  spread a hot key over N partitions, then on key to merge the partial
  results. Exact for algebraic aggregates.
- **Salted join**: explode the small side N ways, salt the big side
  randomly-but-deterministically; every big-side row still meets its
  key's every small-side row exactly once.
- **Bucketed join**: pre-bucketed tables (``writeBucketed``) join with
  ZERO exchanges — the co-location the reference got by hash
  partitioning on doc id, made durable on disk.

(AQE's skew-join splitting handles *sort-merge join* skew
automatically; explicit salting is for aggregations and for joins AQE
can't rewrite.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column → (input
    column, fn) with fn in {sum, count, min, max}. Exact results; the
    hot key's first phase spreads over ``n_salts`` partitions.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1_exprs = []
    phase2_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg fn {fn!r} (needs algebraic merge)")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*phase1_exprs)
        .groupBy(key)
        .agg(*phase2_exprs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``big`` has hot values of ``key``: the small side is
    replicated ``n_salts`` ways, the big side salted deterministically,
    and the join key becomes (key, salt) — the hot key's rows spread
    over n_salts tasks instead of one."""
    exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    return salted_big.join(exploded, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | Sequence[str],
    *,
    n_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: subsequent
    equi-joins and aggregations on the bucket key run with no exchange."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — zero shuffles
    (verify with ``plans.count_exchanges``)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
