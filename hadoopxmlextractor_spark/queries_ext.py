"""Extended operator-coverage queries: the long tail of SURVEY.md §2.3.

Full-outer join, advanced window functions (ntile/percent_rank/
cume_dist/range frames), exact + approximate percentiles, extended
string/date scalar functions, a grouped pandas UDAF (applyInPandas), a
Python UDTF, and deterministic LIMIT/OFFSET pagination.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import DEC, query
from hadoopxmlextractor_spark.tables import load, register_views

# ---------------------------------------------------------------------------
# Joins (completing the matrix)
# ---------------------------------------------------------------------------


@query(
    "join_full_outer",
    """
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big FROM orders
      WHERE o_totalprice > 400000 GROUP BY o_custkey
    ), rich AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
    )
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           c_acctbal AS acctbal,
           n_big
    FROM rich FULL OUTER JOIN big_orders ON c_custkey = o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    # Full outer cannot broadcast (both sides preserved) → shuffle join
    # on the key; both inputs pre-aggregated/filtered so the shuffle is
    # small even when base tables are huge.
    big = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    rich = (
        load(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    return rich.join(big, rich.c_custkey == big.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        "n_big",
    )


# ---------------------------------------------------------------------------
# Window functions (analytic family + range frames)
# ---------------------------------------------------------------------------


@query(
    "window_analytic_family",
    """
    SELECT o_orderkey, o_custkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_analytic_family(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_range_frame",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
           ) AS DOUBLE) AS neighborhood_price
    FROM lineitem
    """,
)
def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(-1, 1)
    )
    return load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast(DEC)).over(w).cast("double").alias(
            "neighborhood_price"
        ),
    )


# ---------------------------------------------------------------------------
# Percentiles / statistics
# ---------------------------------------------------------------------------


@query(
    "percentiles_exact",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_percentiles_exact(spark: SparkSession, sf: str) -> DataFrame:
    # Exact percentile is a sort-based aggregate — fine per group; the
    # 100 TB path is percentile_approx below (mergeable sketch).
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "percentiles_approx",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles_approx(spark: SparkSession, sf: str) -> DataFrame:
    # percentile_approx (Greenwald-Khanna/KLL-style mergeable sketch) is
    # the 100 TB percentile path, but its estimate is approximate by
    # design — so the HASHED output is the gate verdict: the exact
    # percentiles (rounded like percentiles_exact) plus a deterministic
    # within-1% flag comparing the sketch estimate to the unrounded
    # exact value. Both aggregates are deterministic for fixed input;
    # measured relative error is ≤0.08% across sf0.001/0.01/0.1 (12×
    # headroom on the 1% gate). Scalar output columns only (driver
    # canonicalizer rejects arrays).
    approx = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    exact = F.expr("percentile(l_extendedprice, array(0.5, 0.95))")
    grouped = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.element_at(approx, 1).alias("a50"),
            F.element_at(approx, 2).alias("a95"),
            F.element_at(exact, 1).alias("e50"),
            F.element_at(exact, 2).alias("e95"),
        )
    )
    within = (
        F.abs(F.col("a50") - F.col("e50")) / F.col("e50") < 0.01
    ) & (F.abs(F.col("a95") - F.col("e95")) / F.col("e95") < 0.01)
    return grouped.select(
        "l_returnflag",
        F.round("e50", 4).alias("p50_exact"),
        F.round("e95", 4).alias("p95_exact"),
        within.alias("approx_within_1pct"),
    )


@query(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        )
    )


# ---------------------------------------------------------------------------
# Extended scalar functions
# ---------------------------------------------------------------------------


@query(
    "scalar_string_ext",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([A-Za-z]+)$', 1) AS last_word,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%steel%' THEN 'steel' ELSE 'other' END AS material,
           reverse(p_brand) AS brand_rev,
           translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
           split_part(p_type, ' ', 1) AS type_head
    FROM part
    """,
)
def q_scalar_string_ext(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([A-Za-z]+)$", 1).alias("last_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%steel%"), "steel").otherwise("other").alias("material"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_vowels"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@query(
    "scalar_date_ext",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(EXTRACT(week FROM o_orderdate) AS INT) AS week_no,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS quarter_no,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow_sunday0
    FROM orders
    """,
)
def q_scalar_date_ext(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3m"),
        F.weekofyear("o_orderdate").alias("week_no"),
        F.quarter("o_orderdate").alias("quarter_no"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sunday0"),
    )


# ---------------------------------------------------------------------------
# Custom aggregation / table functions
# ---------------------------------------------------------------------------


@query(
    "udaf_grouped_pandas",
    """
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE), 4)
             AS weighted_avg_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped_pandas(spark: SparkSession, sf: str) -> DataFrame:
    # Custom aggregation as applyInPandas: one Arrow batch per group,
    # numpy does the math. Shuffle = the same hash partition a built-in
    # groupBy would use. The sums are carried as exact integers (price
    # cents × integer quantity) so the final double is the correctly
    # rounded value of the same exact ratio the oracle's DECIMAL sums
    # produce — summation order cannot perturb the hash.
    import numpy as np

    def weighted(key, pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"].to_numpy().astype(np.int64)
        cents = np.rint(pdf["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        sum_pq_cents = int((cents * q).sum())  # exact: < 2^63 up to sf ~100
        sum_q = int(q.sum())
        weighted_avg = (float(sum_pq_cents) / 100.0) / float(sum_q)
        return pd.DataFrame(
            {
                "l_returnflag": [key[0]],
                "weighted_avg_price": [round(weighted_avg, 4)],
                "n": [len(pdf)],
            }
        )

    return (
        load(spark, sf, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            weighted, schema="l_returnflag string, weighted_avg_price double, n long"
        )
    )


@query(
    "udtf_sentence_split",
    r"""
    WITH pieces AS (
      SELECT doc_id,
             unnest(string_split(text, '.')) AS piece,
             generate_subscripts(string_split(text, '.'), 1) AS ord
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS INT) AS piece_idx,
           CAST(len(list_filter(regexp_split_to_array(piece, '\s+'), x -> x <> '')) AS INT) AS n_words
    FROM pieces WHERE trim(piece) <> ''
    """,
)
def q_udtf_sentence_split(spark: SparkSession, sf: str) -> DataFrame:
    # Spark 4 Python UDTF: one input row → many output rows with
    # per-piece positions (the lateral-view/table-function surface).
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, piece_idx int, n_words int")
    class PieceCounter:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, piece in enumerate(p for p in text.split(".") if p.strip()):
                yield doc_id, i, len(piece.split())

    docs = load(spark, sf, "documents")
    spark.udtf.register("piece_counter", PieceCounter)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT p.* FROM docs_for_udtf, LATERAL piece_counter(doc_id, text) p"
    )


# ---------------------------------------------------------------------------
# Pagination / distinct
# ---------------------------------------------------------------------------


@query(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def q_sort_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
        .offset(40)
        .limit(20)
    )


@query(
    "distinct_projection",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def q_distinct_projection(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# TPC-H-shaped flagship queries (multi-join + agg + top-k in one plan)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15'
      AND l_shipdate > TIMESTAMP '2000-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q3 shape. Filters push into all three scans; customer
    # (segment-filtered) broadcasts into orders; the orders⨝lineitem
    # join shuffles on orderkey; TakeOrderedAndProject caps the result.
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") < "2000-03-15")
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") > "2000-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).cast("double").alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q5 shape: six-table join. lineitem⨝orders shuffles on
    # orderkey; everything else (customer keyed by custkey is the next
    # shuffle; supplier/nation/region broadcast). The local-supplier
    # constraint (c_nationkey = s_nationkey) rides as a residual filter.
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Null semantics / array + map functions
# ---------------------------------------------------------------------------


@query(
    "null_semantics",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 0 ELSE 1 END AS closed_flag
    FROM orders
    """,
)
def q_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
        status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_open"),
        F.when(status_or_null.isNull(), 0).otherwise(1).alias("closed_flag"),
    )


@query(
    "array_hof_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(SQRT(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])), 5) AS l2,
           ROUND(list_max([CAST(x AS DOUBLE) for x in embedding]), 5) AS max_val,
           len(list_filter([CAST(x AS DOUBLE) for x in embedding], x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q_array_hof_stats(spark: SparkSession, sf: str) -> DataFrame:
    # Array higher-order functions: fine at this width (64 elements);
    # for hot paths at scale prefer the vectorized pandas-UDF form
    # (HOF lambdas are interpreted — see operators/dedup.py).
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 50)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x)), 5
        ).alias("l2"),
        F.round(F.array_max(as_double), 5).alias("max_val"),
        F.size(F.filter(as_double, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "map_functions",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    # Build a map column from the JSON props, operate via map functions
    # (element_at / map_keys), aggregate. DuckDB side reads the same
    # value via JSON (map internals differ per engine; the comparison is
    # on the extracted values).
    ev = load(spark, sf, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select("event_type", F.element_at(m, "k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


@query(
    "union_by_name_missing",
    """
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, NULL AS bal FROM supplier
    """,
)
def q_union_by_name_missing(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    supp = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    return cust.unionByName(supp, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Flagship multi-join family (TPC-H shapes over the available columns)
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q4 shape: correlated EXISTS with an inequality becomes a
    # LEFT SEMI join on (orderkey, l_shipdate > o_orderdate). The date
    # filter pushes into the orders scan; the semi join shuffles both
    # sides on orderkey and emits each order at most once — no
    # post-join dedup needed at any scale.
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q10 shape. returnflag/date filters push into the scans;
    # lineitem⨝orders shuffles on orderkey, then on custkey into
    # customer; 25-row nation broadcasts. TakeOrderedAndProject caps
    # the driver-side merge at 20 rows per partition.
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q13 shape: left outer join preserving order-less customers,
    # then a two-level aggregation. The first agg shuffles on custkey
    # (same key as the join, so AQE can reuse the exchange); the second
    # agg's key space is tiny (distinct order counts) and map-side
    # partials shrink it before the final single-digit-row shuffle.
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice, total_qty
    FROM (SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q18 shape: the HAVING pre-aggregation shrinks lineitem to
    # qualifying orderkeys BEFORE any join (map-side partials, one
    # shuffle on orderkey); the orders join reuses the orderkey
    # partitioning, then one shuffle on custkey. No broadcast: at
    # scale every side here is large.
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_raw"))
        .filter(F.col("qty_raw") > 300)
        .select("l_orderkey", F.col("qty_raw").cast("double").alias("total_qty"))
    )
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "agg_order_stats",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(median(c_acctbal) AS DOUBLE), 2) AS median_bal,
           arg_max(c_name,
                   CAST(round(c_acctbal*100) AS BIGINT)*1000000 + c_custkey)
             AS richest,
           arg_min(c_name,
                   CAST(round(c_acctbal*100) AS BIGINT)*1000000 + c_custkey)
             AS poorest
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_agg_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    # Order-statistic aggregates: exact grouped median plus argmax /
    # argmin via max_by/min_by. The ordering key folds the tiebreaker
    # IN (cents·1e6 + custkey is unique), because max_by on a
    # non-unique key is engine-arbitrary — the same determinism rule
    # the hash-rank sampling queries follow. Median is exact
    # (interpolated) on both engines; at 100 TB grouped exact median
    # costs one sort-based agg per group — swap to percentile_approx
    # when that bound matters (see percentiles_approx).
    cust = load(spark, sf, "customer")
    nat = load(spark, sf, "nation")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("long") * F.lit(1000000)
        + F.col("c_custkey")
    )
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.median("c_acctbal"), 2).alias("median_bal"),
            F.max_by("c_name", key).alias("richest"),
            F.min_by("c_name", key).alias("poorest"),
        )
    )


@query(
    "agg_value_histogram",
    """
    SELECT event_type, CAST(floor(value / 50) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_agg_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    # Fixed-width histogram: floor(value/width) binning entirely in the
    # scan projection, then a (type, bucket)-keyed count — partial
    # aggregation collapses everything map-side, so the exchange
    # carries |types|×|buckets| rows at any corpus size. The binning
    # expression (not width_bucket) keeps the SQL portable across
    # engines.
    ev = load(spark, sf, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 50).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "scalar_try_safe",
    """
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS parsed_chars,
           ROUND(n_chars / (doc_id % 3), 4) AS safe_ratio
    FROM documents
    """,
)
def q_scalar_try_safe(spark: SparkSession, sf: str) -> DataFrame:
    # ANSI error-safe expressions: try_cast yields NULL instead of a
    # job-killing runtime error on malformed input, try_divide on a
    # zero divisor — the difference between one bad row poisoning a
    # 100 TB job and a NULL you can audit afterwards. DuckDB's
    # TRY_CAST and its NULL-on-zero division are the exact oracle
    # twins. Pure scan projection, zero shuffle.
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.expr("try_cast(lang AS INT)").alias("lang_as_int"),
        F.expr("try_cast(CAST(n_chars AS STRING) AS INT)").alias("parsed_chars"),
        F.round(F.expr("try_divide(n_chars, doc_id % 3)"), 4).alias("safe_ratio"),
    )


@query(
    "set_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def q_set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    # Bag-semantics intersection — each custkey survives min(m, n)
    # times, which SQL INTERSECT (distinct) cannot express; Spark
    # plans it as a left-semi-style hash join over per-row counts.
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@query(
    "set_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def q_set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    # Bag-semantics difference: multiplicities subtract (max(m-n, 0)
    # copies survive) — the dedup-aware "remove one occurrence per
    # match" shape distinct EXCEPT cannot express.
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "sql_unpivot",
    """
    SELECT n_name, metric, CAST(val AS BIGINT) AS val FROM (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(COUNT(*) FILTER (WHERE c.c_acctbal > 5000) AS BIGINT)
               AS n_rich,
             CAST(COUNT(*) FILTER (WHERE c.c_mktsegment = 'BUILDING')
               AS BIGINT) AS n_building
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ) UNPIVOT (val FOR metric IN (n_customers, n_rich, n_building))
    """,
)
def q_sql_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    # Two SQL-surface features in one ANSI statement sent VERBATIM to
    # both engines through spark.sql: aggregate FILTER clauses
    # (conditional counts without CASE scaffolding) and UNPIVOT
    # (wide metrics -> long (metric, val) rows — Spark compiles it to
    # the same Expand the stack() profile queries use, one scan).
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT n_name, metric, CAST(val AS BIGINT) AS val FROM (
          SELECT n.n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(COUNT(*) FILTER (WHERE c.c_acctbal > 5000) AS BIGINT)
                   AS n_rich,
                 CAST(COUNT(*) FILTER (WHERE c.c_mktsegment = 'BUILDING')
                   AS BIGINT) AS n_building
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name
        ) UNPIVOT (val FOR metric IN (n_customers, n_rich, n_building))
        """
    )


@query(
    "agg_trimmed_mean",
    """
    WITH ranked AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY round(value * 100), event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*) / 100, 4) AS trimmed_mean
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
)
def q_agg_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    # Robust statistics: 10%-trimmed mean per event type, trimming by
    # COUNT rank rather than interpolated percentile boundaries —
    # floor(n/10) rows drop from each tail, so the kept set is an
    # integer-defined, engine-identical slice (no float boundary to
    # diverge on). One group-keyed window + the aggregate riding the
    # same exchange; DECIMAL accumulation, division last.
    ev = load(spark, sf, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return (
        ranked.filter(
            (F.col("rn") > F.expr("n div 10"))
            & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(
                F.sum(F.col("cents").cast("decimal(38,0)"))
                .cast("double")
                / F.count(F.lit(1))
                / 100,
                4,
            ).alias("trimmed_mean"),
        )
    )


@query(
    "agg_mode",
    """
    SELECT event_type, cents AS modal_cents, CAST(cnt AS BIGINT) AS cnt
    FROM (
      SELECT event_type, cents, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, cents) AS rk
      FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                   COUNT(*) AS cnt
            FROM events GROUP BY event_type, cents)
    ) WHERE rk = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic MODE: engines' built-in mode() breaks frequency
    # ties arbitrarily, so the tie-break is folded into the ranking
    # (cnt DESC, value ASC) — the same lesson as max_by in
    # agg_order_stats. Two shuffles: value-keyed count (partial-agg
    # combined), then the dimension-sized argmax window.
    ev = load(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    counts = ev.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("cents"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("cents").alias("modal_cents"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
    )


@query(
    "scalar_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           (CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL)
             AS has_k,
           CAST(NULL AS INT) AS missing_prop
    FROM events
    """,
)
def q_scalar_variant(spark: SparkSession, sf: str) -> DataFrame:
    # The Spark 4 VARIANT path for semi-structured data: parse_json
    # builds the binary-encoded variant ONCE, then typed variant_get
    # extractions replace repeated string re-parsing (the
    # get_json_object anti-pattern at scale — every call re-tokenizes
    # the JSON text; a variant column parses at ingest and serves any
    # number of typed reads). try_variant_get returns NULL instead of
    # erroring on absent paths — the ANSI-safe read.
    return load(spark, sf, "events").select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("prop_k"),
        F.expr("variant_get(parse_json(props), '$.k', 'int')").isNotNull().alias("has_k"),
        F.expr("try_variant_get(parse_json(props), '$.absent', 'int')").alias(
            "missing_prop"
        ),
    )


# ---------------------------------------------------------------------------
# Correlation matrix (exact integer moments)
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    cents = ", ".join(
        f"CAST(floor({c} * 100 + 0.5) AS BIGINT) AS {c}" for c in _CORR_COLS
    )
    moms = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for i, a in enumerate(_CORR_COLS):
        moms.append(f"SUM(CAST({a} AS HUGEINT)) AS s{i}")
        for j2, b in enumerate(_CORR_COLS[i:], start=i):
            moms.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS p{i}{j2}")
    pair_rows = []
    for i, a in enumerate(_CORR_COLS):
        for j2, b in enumerate(_CORR_COLS[i + 1 :], start=i + 1):
            pair_rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
                f"ROUND((CAST(n AS DOUBLE) * CAST(p{i}{j2} AS DOUBLE)"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{j2} AS DOUBLE))"
                f" / (sqrt(CAST(n AS DOUBLE) * CAST(p{i}{i} AS DOUBLE)"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
                f" * sqrt(CAST(n AS DOUBLE) * CAST(p{j2}{j2} AS DOUBLE)"
                f" - CAST(s{j2} AS DOUBLE) * CAST(s{j2} AS DOUBLE))), 4)"
                f" AS corr FROM m"
            )
    return (
        "WITH c AS (SELECT " + cents + " FROM lineitem),\n"
        "m AS MATERIALIZED (SELECT " + ",\n  ".join(moms) + " FROM c)\n"
        + "\nUNION ALL\n".join(pair_rows)
    )


@query("agg_corr_matrix", _corr_oracle())
def q_agg_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    # Pairwise Pearson correlation of the lineitem numeric columns —
    # the data-profiling staple — via EXACT integer moments: values →
    # cents (floor(x*100+0.5), bit-deterministic), all sums/products
    # accumulated in DECIMAL(38,0) (HUGEINT in the oracle), then ONE
    # identical IEEE double chain + ROUND on both engines. One scan,
    # one 1-row global aggregate; never the corr() builtin, whose
    # float accumulation order is partitioning-dependent.
    li = load(spark, sf, "lineitem")
    cents = {c: F.floor(F.col(c) * 100 + 0.5) for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i, a in enumerate(_CORR_COLS):
        aggs.append(F.sum(cents[a].cast("decimal(19,0)")).alias(f"s{i}"))
        for j2, b in enumerate(_CORR_COLS[i:], start=i):
            aggs.append(
                F.sum(
                    cents[a].cast("decimal(19,0)") * cents[b].cast("decimal(19,0)")
                ).alias(f"p{i}{j2}")
            )
    m = li.agg(*aggs)
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for j2, b in enumerate(_CORR_COLS[i + 1 :], start=i + 1):
            n, sx, sy = [F.col(x).cast("double") for x in ("n", f"s{i}", f"s{j2}")]
            pxy, pxx, pyy = [
                F.col(x).cast("double")
                for x in (f"p{i}{j2}", f"p{i}{i}", f"p{j2}{j2}")
            ]
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    F.round(
                        (n * pxy - sx * sy)
                        / (F.sqrt(n * pxx - sx * sx) * F.sqrt(n * pyy - sy * sy)),
                        4,
                    ).alias("corr"),
                )
            )
    # ONE aggregate row exploded to the 6 pairs (a union of per-pair
    # selects would re-run the scan+aggregate once per pair).
    return m.select(F.explode(F.array(*pairs)).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Scalar families: bitwise + regex
# ---------------------------------------------------------------------------


@query(
    "scalar_bitwise",
    """
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 15 AS BIGINT) AS or_mask,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(o_orderkey << 3 AS BIGINT) AS shl,
           CAST(o_orderkey >> 2 AS BIGINT) AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def q_scalar_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    # Bitwise family parity pin — the ops every hash/sketch kernel in
    # this repo leans on (SimHash chunks, aHash lanes, Morton codes),
    # surfaced as a registered scalar query so cross-engine semantics
    # (two's-complement popcount included) stay pinned.
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 97 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(15)).cast("bigint").alias("or_mask"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("xored"),
        F.shiftleft(k, 3).cast("bigint").alias("shl"),
        F.shiftright(k, 2).cast("bigint").alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "scalar_regex_family",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           regexp_replace(text, '\s+', '_', 'g') AS underscored,
           regexp_matches(text, '^[a-z]') AS starts_lower
    FROM documents WHERE doc_id % 29 = 0
    """,
)
def q_scalar_regex_family(spark: SparkSession, sf: str) -> DataFrame:
    # Regex family parity pin on engine-agreeing constructs (character
    # classes, quantifiers, global replace — no lookaround or
    # boundary-class corners, where Java regex and RE2 diverge; the
    # PII audit pins those separately with planted evidence).
    d = load(spark, sf, "documents").filter(F.col("doc_id") % 29 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0)).alias(
            "n_numbers"
        ),
        F.regexp_replace("text", r"\s+", "_").alias("underscored"),
        F.col("text").rlike(r"^[a-z]").alias("starts_lower"),
    )


@query(
    "agg_grouping_id",
    """
    SELECT COALESCE(l_returnflag, '(all)') AS rf,
           COALESCE(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf: str) -> DataFrame:
    # grouping() bitmask parity: the only reliable way to tell a real
    # NULL group from a CUBE subtotal row — COALESCE labels alone are
    # ambiguous the moment the data contains the label value. Pinned
    # cross-engine because the bit order of GROUPING_ID differs by
    # engine while per-column GROUPING() does not.
    li = load(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
            "g_rf",
            "g_ls",
            "n",
        )
    )
