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


def forget_residual_audit(
    docs: DataFrame,
    removal: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Right-to-be-forgotten propagation audit: after deleting the
    requested ids, how many VERBATIM copies of each removed document's
    content still sit in the corpus under other ids (mirrors,
    re-crawls, quote-pastes)? An id-based delete silently leaves them
    behind — this is the check a takedown pipeline must run before
    declaring a request honored, and the per-request count is the
    work-list for the follow-up content-hash delete.

    ``removal`` carries the requested ``id_col`` values. Returns one
    row per request: (doc_id, n_exact_residuals) — zero means clean.

    Scale shape: content equality joins on md5(text) — fixed-width
    uniform keys, the dedup_exact shuffle; the removal side (a
    takedown list, bounded) broadcasts onto the corpus-after-delete
    hash table, so the audit is one corpus scan + one broadcast join
    regardless of corpus size. Near-dup residuals are the composition
    with the LSH path (flag via minhash_incremental_flags against the
    removed docs' signatures); this operator is the exact-copy gate.
    """
    hashed = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("cid"), F.md5(F.col(text_col)).alias("h")
    )
    removed_ids = removal.select(F.col(id_col).alias("rid")).distinct()
    requested = hashed.join(
        F.broadcast(removed_ids), hashed.cid == F.col("rid")
    ).select(F.col("cid").alias("doc_id"), "h")
    survivors = hashed.join(
        F.broadcast(removed_ids), hashed.cid == F.col("rid"), "left_anti"
    )
    # the request side rides a BROADCAST into the corpus scan (map-side
    # inner join, zero corpus shuffle), and the per-request counts join
    # back to the request list to keep the zero rows — both joins are
    # request-sized on at least one side
    counts = (
        survivors.join(
            F.broadcast(requested.withColumnRenamed("doc_id", "req_id")), "h"
        )
        .groupBy("req_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_residuals"))
    )
    return (
        requested.select("doc_id")
        .join(F.broadcast(counts), requested.doc_id == F.col("req_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_exact_residuals", F.lit(0))
            .cast("bigint")
            .alias("n_exact_residuals"),
        )
    )
