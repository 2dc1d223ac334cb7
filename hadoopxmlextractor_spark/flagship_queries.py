"""Second wave of TPC-H-shape flagship queries: scan-only aggregation
(Q6), dual-dimension multi-join (Q7), conditional-aggregate ratio (Q14),
correlated-average decorrelation (Q17), disjunctive join predicates
(Q19), and scalar-subquery + anti-join (Q22 shape).

Value discipline follows CLAUDE.md: money sums accumulate as
DECIMAL(18,2) and the FINAL column casts to DOUBLE on both sides;
averages that feed comparisons are computed as exact-decimal-sum /
count so the threshold is the identical IEEE double in Spark and
DuckDB (plain AVG over doubles is summation-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import DEC, query
from hadoopxmlextractor_spark.tables import load


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q6 shape: pure scan-aggregate. All three predicates push to
    # the parquet reader (row-group stats skip on shipdate/quantity) and
    # only 4 of 11 columns are read; at 100 TB this is I/O-bound with
    # zero shuffle — the partial agg reduces each task to one row.
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q7 shape. Both nation dims broadcast (25 rows) so the
    # nation-pair disjunction is evaluated without a shuffle; the big
    # joins shuffle on orderkey then custkey at scale. The pair filter
    # references both sides so it cannot push below the joins whole,
    # but Catalyst derives the per-side disjunct
    # (n_name='NATION_1' OR n_name='NATION_2') into BOTH nation scans
    # (verified: PushedFilters on each), shrinking the broadcast to the
    # two relevant nations before any join runs.
    sf_dir = sf
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                   * CAST(1 - l_discount AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE),
             4) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q14 shape: conditional aggregation computing a ratio in one
    # pass (no self-join, no second scan). The one-month shipdate filter
    # pushes to parquet; part (bounded dimension) broadcasts. Both sums
    # accumulate as exact DECIMAL and the division happens on the final
    # doubles with identical ROUND on both sides.
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load(spark, sf, "part")
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(volume).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
                 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < qty_threshold
    """,
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q17 shape: the correlated AVG subquery is decorrelated into
    # a per-part aggregate joined back to lineitem — one extra shuffle
    # on partkey instead of a per-row subquery. The threshold is
    # exact-decimal-sum / count (quantities are integral, so the sum is
    # exact and the comparison is the same IEEE double on both engines).
    # part is filtered to one brand BEFORE the join, and at scale the
    # per-part aggregate joins on the already-shuffled partkey.
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pq_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_q19_disjunctive_predicates(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q19 shape: a disjunction mixing columns from both join
    # sides. Catalyst keeps the equi-join on partkey and derives the
    # per-side residuals (p_brand IN (...) on part, quantity ∈ [1,30]
    # on lineitem) so both scans shrink before the broadcast join —
    # the OR never forces a nested-loop join.
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "sql_interface_segment_share",
    """
    WITH seg AS (
      SELECT c_mktsegment AS segment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT segment, revenue, n_orders,
           ROUND(100.0 * revenue / SUM(revenue) OVER (), 4) AS revenue_share_pct
    FROM seg
    """,
)
def q_sql_interface_segment_share(spark: SparkSession, sf: str) -> DataFrame:
    # The engine's SQL surface: the SAME ANSI text runs through
    # spark.sql over temp views and through DuckDB — Catalyst plans it
    # identically to the DataFrame API (customer broadcasts under AQE;
    # the empty-frame SUM() OVER () is a single-partition window over
    # the 5-row segment aggregate, not over the raw data).
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment AS segment,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        )
        SELECT segment, revenue, n_orders,
               ROUND(100.0 * revenue / SUM(revenue) OVER (), 4) AS revenue_share_pct
        FROM seg
        """
    )


@query(
    "q22_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q_q22_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q22 shape (country code adapted to c_nationkey — the
    # synthetic customer table has no phone column; "never ordered"
    # adapted to "no order since 2000" because every synthetic customer
    # has at least one order): scalar subquery (global positive-balance
    # average) + anti join against filtered orders. The average is
    # exact-decimal-sum / count so the filter threshold is bit-identical
    # across engines. At scale: the scalar aggregate is one tiny job
    # whose result folds into the filter; the date filter pushes into
    # the orders scan before the anti join shuffles on custkey; the
    # final aggregate is over the small remainder.
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "a"
            )
        )
        .first()[0]
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "sql_lateral_topk",
    """
    SELECT n_name, c.c_name, c.bal
    FROM nation, LATERAL (
      SELECT c_name, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    """,
)
def q_sql_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL-text
    # spelling of per-group top-k. Catalyst decorrelates it into the
    # same ranked-window shape as the DataFrame `window_topk_per_group`
    # (per-partition group limit, no per-outer-row re-execution), so
    # the scale story is the window one, while users keep the ANSI
    # lateral idiom. Identical text runs on DuckDB.
    load(spark, sf, "nation").createOrReplaceTempView("nation")
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, c.c_name, c.bal
        FROM nation, LATERAL (
          SELECT c_name, CAST(c_acctbal AS DOUBLE) AS bal
          FROM customer WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        """
    )


@query(
    "sql_recursive_date_spine",
    """
    WITH RECURSIVE days(d) AS (
      SELECT DATE '2024-01-01'
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
      WHERE d < DATE '2024-01-30'
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(event_id) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT days.d, CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
    FROM days LEFT JOIN daily ON daily.d = days.d
    """,
)
def q_sql_recursive_date_spine(spark: SparkSession, sf: str) -> DataFrame:
    # Recursive CTE (Spark 4 finally has WITH RECURSIVE): generate a
    # gap-free calendar spine and attach daily event counts — the
    # canonical "report zero-activity days too" pattern that
    # previously needed sequence()+explode. The fact stream aggregates
    # per day FIRST (partial combine collapses it map-side), so the
    # spine join touches |days| rows on each side; joining the RAW
    # stream to the spine instead would funnel every event through a
    # |days|-key exchange — a hot-key shuffle at 100 TB. The recursion
    # itself is 30 driver-cheap rows. Identical text runs on DuckDB.
    load(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE'2024-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM days WHERE d < DATE'2024-01-30'
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, CAST(count(event_id) AS BIGINT) AS n
          FROM events GROUP BY 1
        )
        SELECT days.d, CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
        FROM days LEFT JOIN daily ON daily.d = days.d
        """
    )
