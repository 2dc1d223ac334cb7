#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count + column names + order-insensitive
values. Usage: python scripts/check_correctness.py [sf_dir] [query ...]

Comparison is FULL-PRECISION and representation-faithful, mirroring the
driver's canonicalizer: both results become pandas DataFrames (Spark via
``toPandas()``, DuckDB via ``.df()``), columns are sorted by name, and
every cell is stringified with pandas ``astype(str)`` semantics. That
makes the gate sensitive to exactly what the driver's hash is sensitive
to: ``Decimal('1.50')`` vs ``1.5`` differs, int64 ``1`` vs float64
``1.0`` differs, while int32 vs int64 and datetime64[ns] vs [us] with
equal values agree. (Round-1 lesson: a %.6g normalization here hid 14
driver hash failures.)
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from hadoopxmlextractor_spark.tables import TABLE_NAMES  # noqa: E402

# Output-type contract (see CLAUDE.md): final query schemas may only use
# these canonicalization-safe families. DECIMAL/TIMESTAMP/ARRAY/MAP/
# STRUCT outputs hash differently (or crash) in the driver harness.
BANNED_SPARK_TYPES = ("DecimalType", "TimestampType", "ArrayType", "MapType", "StructType")


def canon_frame(pdf):
    cols = sorted(pdf.columns)
    body = pdf[cols].astype(str)
    return cols, sorted(tuple(r) for r in body.values.tolist())


def audit_schema(name: str, sdf) -> list[str]:
    bad = []
    for field in sdf.schema.fields:
        tname = type(field.dataType).__name__
        if tname in BANNED_SPARK_TYPES:
            bad.append(f"{name}.{field.name}: {tname}")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            type_violations = audit_schema(name, sdf)
            s_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if type_violations:
            print(f"FAIL  {name}: banned output type(s): {'; '.join(type_violations)}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_pdf)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            d_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(s_pdf) != len(d_pdf):
            problems.append(f"rowcount spark={len(s_pdf)} duckdb={len(d_pdf)}")
        if sorted(s_pdf.columns) != sorted(d_pdf.columns):
            problems.append(
                f"columns spark={sorted(s_pdf.columns)} duckdb={sorted(d_pdf.columns)}"
            )
        if not problems:
            (s_cols, sn), (_, dn) = canon_frame(s_pdf), canon_frame(d_pdf)
            if sn != dn:
                diff = next(
                    ((i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b),
                    (min(len(sn), len(dn)), None, None),
                )
                problems.append(
                    f"values differ (cols {s_cols}), first diff at sorted idx "
                    f"{diff[0]}: spark={diff[1]} duckdb={diff[2]}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(s_pdf)} rows)")
            n_pass += 1
        # bound the 218-query session: queries are independent, so any
        # cache/localCheckpoint blocks a query left behind are garbage
        spark.catalog.clearCache()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
