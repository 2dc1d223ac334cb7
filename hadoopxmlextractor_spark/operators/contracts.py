"""Data-contract validation: declarative row-level expectations over a
DataFrame, evaluated in ONE aggregate pass — the quality gate a corpus
pipeline runs before promoting a snapshot (reject-on-violation or
publish-with-report).

Row rules are (name, boolean Column) pairs counted with conditional
sums, so N rules cost one scan and zero shuffles beyond the single
global aggregate; a uniqueness rule adds COUNT - COUNT(DISTINCT key)
inside the same aggregate (exact here; at 100 TB swap the distinct for
approx_count_distinct and treat the rule as a monitor, or groupBy-count
the key when exactness must gate the publish)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_contract(
    df: DataFrame,
    row_rules: list[tuple[str, Column]],
    *,
    unique_key: str | None = None,
) -> DataFrame:
    """Returns one row per rule: (rule, n_violations, passed). A row
    violates a rule when the rule column is FALSE OR NULL (null-hostile
    on purpose: an unevaluable expectation is a violation, not a skip).
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in row_rules
    ]
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.countDistinct(unique_key)).alias(
                f"unique_{unique_key}"
            )
        )
    wide = df.agg(*aggs)
    names = [name for name, _ in row_rules] + (
        [f"unique_{unique_key}"] if unique_key is not None else []
    )
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
