"""Physical-plan inspection helpers.

The engine's scale contract is enforced as *tests over plans*, not
hopes: shuffle counts, broadcast choices, filter pushdown, and column
pruning are asserted from the executed plan string (see
``tests/test_plans.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges —
    ``\\bExchange\\b`` cannot match inside "BroadcastExchange" because
    there is no word boundary after "Broadcast")."""
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column list of each parquet scan (ReadSchema) — proves pruning."""
    plan = executed_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across the plan's file scans —
    proves directory-level pruning on a partitioned layout."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out
