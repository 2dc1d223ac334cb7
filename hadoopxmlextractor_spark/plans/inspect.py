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


def lint_plan(df: DataFrame) -> list[dict]:
    """Pre-flight LINT of a query's executed plan — the scale
    anti-patterns this repo's test suite asserts against, surfaced as
    a user-facing API so a pipeline can gate an unfamiliar query
    before running it at 100 TB (run the lint against a small sample
    of the same tables; the PLAN SHAPE is what transfers, not the
    data volume). Returns a list of findings, each
    ``{"severity", "code", "detail"}``; empty = no known
    anti-pattern. Checks:

    - ``cartesian`` / ``nested_loop`` (error): CartesianProduct or
      BroadcastNestedLoopJoin — all-pairs cost, the plans that turn a
      join typo into a cluster-week.
    - ``unfiltered_scan`` (warning): a file scan whose PushedFilters
      AND PartitionFilters are both empty while the query contains a
      Filter node — the predicate exists but never reached the scan
      (wrong column type, UDF in the predicate, or a cast blocking
      pushdown).
    - ``wide_scan`` (warning): a scan whose read-column count is
      more than 3× the FINAL projection width (and above a floor of
      3) — scan width judged relative to the result, not to the
      table's total column count, so a query that reads many columns
      to produce few is flagged as likely-lost pruning (SELECT *
      somewhere upstream) regardless of table width.
    - ``rowwise_python`` (warning): a non-Arrow BatchEvalPython node —
      a row-at-a-time Python UDF in the plan (~10-100× slower than
      the Arrow path).
    """
    plan = executed_plan(df)
    findings: list[dict] = []
    if "CartesianProduct" in plan:
        findings.append({
            "severity": "error", "code": "cartesian",
            "detail": "CartesianProduct in plan: all-pairs cost",
        })
    if "BroadcastNestedLoopJoin" in plan:
        findings.append({
            "severity": "error", "code": "nested_loop",
            "detail": "BroadcastNestedLoopJoin: non-equi join degraded "
                      "to a per-row loop over the broadcast side",
        })
    has_filter_node = re.search(r"\bFilter\b", plan) is not None
    scans = re.findall(
        r"FileScan[^\n]*", plan
    )
    if has_filter_node and scans:
        pushed = pushed_filters(df)
        parts = partition_filters(df)
        if not pushed and not parts:
            findings.append({
                "severity": "warning", "code": "unfiltered_scan",
                "detail": "Filter present but no PushedFilters/"
                          "PartitionFilters reached any scan",
            })
    n_out = len(df.schema.fields)
    for cols in scan_columns(df):
        if len(cols) > max(3, 3 * n_out) and len(cols) > 2:
            findings.append({
                "severity": "warning", "code": "wide_scan",
                "detail": f"scan reads {len(cols)} columns for a "
                          f"{n_out}-column result — pruning lost",
            })
            break
    if "BatchEvalPython" in plan:
        # BatchEvalPython = pickled row-at-a-time UDF; ArrowEvalPython
        # (the pandas_udf node, a different node name) is the
        # sanctioned path and never trips this
        findings.append({
            "severity": "warning", "code": "rowwise_python",
            "detail": "row-at-a-time Python UDF (BatchEvalPython) in "
                      "the plan — use a pandas_udf",
        })
    return findings
