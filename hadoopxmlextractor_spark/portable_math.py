"""Cross-engine bit-identical transcendentals for oracle-exact queries.

The repo's float discipline builds oracles from IDENTICAL double
expression trees on both engines (CLAUDE.md). That breaks down at a
libm call: JVM ``Math.log`` and DuckDB ``ln`` are each correctly
rounded *to about 1 ulp* but are NOT guaranteed to round the same way,
so a term sitting within an ulp of a ROUND half-boundary could flip on
one engine only (the `search_bm25_topk` risk flagged in round 6).

Fix: don't call libm at all. ``portable_ln`` evaluates ln(x) for
x >= 1 as an EXPLICIT tree of IEEE-754 double +,-,*,/ and integer
comparisons that Spark, DuckDB, and plain Python all execute
identically (none of the three reassociates scalar float expressions):

    x = m * 2^e,  m in [1, 2)
    e   : sum of 62 indicator comparisons  x >= 2^k   (exact: power-of-
          two literals are exact doubles, comparison is exact)
    m   : x * 2^-e via a CASE over e (multiplying by a power of two is
          EXACT in binary floating point — no rounding enters)
    t   : (m - 1) / (m + 1)                 |t| < 1/3
    ln m: 2 * t * P(t^2), the atanh series t + t^3/3 + ... as an
          18-term Horner chain (tail < 2^-63 at |t| = 1/3)
    ln x: e * LN2 + ln m

Every constant is injected as a 17-significant-digit literal that
round-trips to the same double in all three parsers, and the three
emitters below are generated from the SAME coefficient list, so they
cannot drift. Result: both engines compute the SAME function — agreement
is by construction, not by hoping two libms round alike. Accuracy vs
true ln is still ~1 ulp (series tail + one rounding per op), verified
against math.log in tests.

Scale note: this is a scalar expression — whole-stage-codegen'd on the
Spark side (no UDF), a few dozen comparisons and 40 flops per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# repr(math.log(2)) — round-trips to the same double in Python, Spark
# SQL, and DuckDB.
LN2 = 0.6931471805599453
LN2_LIT = "0.6931471805599453"

_N_TERMS = 18  # atanh series 1/(2k+1), k = 0..17; tail < 1.2e-19 at t=1/3
_COEFFS = [1.0 / (2 * k + 1) for k in range(_N_TERMS)]
_MAX_E = 62  # supports x up to 2^63 — far past any corpus-count idf


def portable_ln_py(x: float) -> float:
    """Reference replay (pure Python floats = IEEE doubles, same ops
    in the same order as the SQL/Spark emitters). Domain: x >= 1."""
    e = 0
    for k in range(1, _MAX_E + 1):
        e += 1 if x >= float(2**k) else 0
    m = x * float(2.0 ** -e)
    t = (m - 1.0) / (m + 1.0)
    s = t * t
    p = _COEFFS[_N_TERMS - 1]
    for k in range(_N_TERMS - 2, -1, -1):
        p = _COEFFS[k] + (s * p)
    return (float(e) * LN2) + ((2.0 * t) * p)


def with_portable_ln(df: DataFrame, x_col: str, out_col: str) -> DataFrame:
    """Add ``out_col`` = portable_ln(``x_col``) via staged intermediate
    columns (dropped afterwards), so Catalyst keeps the projections
    staged instead of inlining one giant tree. ``x_col`` must be a
    double >= 1."""
    x = F.col(x_col)
    pe = None
    for k in range(1, _MAX_E + 1):
        ind = F.when(x >= float(2**k), F.lit(1)).otherwise(F.lit(0))
        pe = ind if pe is None else (pe + ind)
    df = df.withColumn("__pln_e", pe)
    # m = x * 2^-e — exact scaling by a power-of-two literal
    m_case = None
    for k in range(_MAX_E + 1):
        lit = F.lit(float(2.0**-k))
        m_case = (
            F.when(F.col("__pln_e") == k, lit)
            if m_case is None
            else m_case.when(F.col("__pln_e") == k, lit)
        )
    df = df.withColumn("__pln_m", x * m_case)
    df = df.withColumn(
        "__pln_t", (F.col("__pln_m") - F.lit(1.0)) / (F.col("__pln_m") + F.lit(1.0))
    )
    df = df.withColumn("__pln_s", F.col("__pln_t") * F.col("__pln_t"))
    p = F.lit(_COEFFS[_N_TERMS - 1])
    for k in range(_N_TERMS - 2, -1, -1):
        p = F.lit(_COEFFS[k]) + (F.col("__pln_s") * p)
    df = df.withColumn(
        out_col,
        (F.col("__pln_e").cast("double") * F.lit(LN2))
        + ((F.lit(2.0) * F.col("__pln_t")) * p),
    )
    return df.drop("__pln_e", "__pln_m", "__pln_t", "__pln_s")


def portable_ln_ctes(base_cte: str, x_col: str, out_col: str, prefix: str = "pln") -> str:
    """DuckDB side: emit chained CTE clauses (to append after an
    existing ``WITH ... , `` list) that carry every column of
    ``base_cte`` plus ``out_col``. The final CTE is named
    ``{prefix}_out``. Each CTE is referenced exactly once, so DuckDB's
    CTE inlining stays linear."""
    e_terms = " + ".join(
        f"CASE WHEN {x_col} >= {float(2**k)!r} THEN 1 ELSE 0 END"
        for k in range(1, _MAX_E + 1)
    )
    m_branches = " ".join(
        f"WHEN {k} THEN {float(2.0**-k)!r}" for k in range(_MAX_E + 1)
    )
    horner = repr(_COEFFS[_N_TERMS - 1])
    for k in range(_N_TERMS - 2, -1, -1):
        horner = f"({_COEFFS[k]!r} + ({prefix}_s * {horner}))"
    return f"""
    {prefix}_1 AS (SELECT *, ({e_terms}) AS {prefix}_e FROM {base_cte}),
    {prefix}_2 AS (SELECT *, {x_col} * (CASE {prefix}_e {m_branches} END)
                   AS {prefix}_m FROM {prefix}_1),
    {prefix}_3 AS (SELECT *, ({prefix}_m - 1.0) / ({prefix}_m + 1.0)
                   AS {prefix}_t FROM {prefix}_2),
    {prefix}_4 AS (SELECT *, {prefix}_t * {prefix}_t AS {prefix}_s
                   FROM {prefix}_3),
    {prefix}_out AS (
      SELECT *,
             (CAST({prefix}_e AS DOUBLE) * {LN2_LIT})
             + ((2.0 * {prefix}_t) * {horner}) AS {out_col}
      FROM {prefix}_4
    )"""
