"""portable_ln: the three emitters (Python replay, DuckDB CTE chain,
Spark staged columns) must agree BIT-FOR-BIT — that identity is what
lets an oracle-exact query keep a transcendental in its scoring
formula (search_bm25_topk) — and the shared function must still be
~1-ulp accurate against libm."""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np

from hadoopxmlextractor_spark.portable_math import (
    portable_ln_ctes,
    portable_ln_py,
    with_portable_ln,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _grid() -> list[float]:
    rng = np.random.RandomState(20260815)
    xs = [1.0, 1.0 + 2**-40, 1.5, 2.0, 3.0, 4.0, 7.77, 100.0,
          1234.5678, 2.0**30 + 0.25, 9.9e17, 1.9999999999]
    xs += list(1.0 + np.abs(rng.standard_cauchy(200)))
    return [float(x) for x in xs]


def test_portable_ln_accuracy_vs_libm():
    for x in _grid():
        ref = math.log(x)
        got = portable_ln_py(x)
        assert abs(got - ref) <= max(abs(ref), 1.0) * 5e-15, (x, got, ref)


def test_portable_ln_duckdb_bit_exact():
    xs = _grid()
    con = duckdb.connect()
    sql = (
        "WITH base AS (SELECT unnest(?::DOUBLE[]) AS x),"
        + portable_ln_ctes("base", "x", "lnx")
        + " SELECT x, lnx FROM pln_out"
    )
    for x, lnx in con.execute(sql, [xs]).fetchall():
        assert _bits(lnx) == _bits(portable_ln_py(x)), x


def test_portable_ln_spark_bit_exact(spark):
    xs = _grid()
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    for r in with_portable_ln(df, "x", "lnx").collect():
        assert _bits(r.lnx) == _bits(portable_ln_py(r.x)), r.x
