"""Third wave of TPC-H-shape flagship queries, completing the 22-query
family (Q1≈agg_pricing_summary; Q3/4/5/6/7/10/13/14/17/18/19/22 are in
queries_ext / flagship_queries). The synthetic schema has no partsupp
table and no l_shipmode/l_commitdate/l_receiptdate columns, so the
shapes that need them are adapted — the *plan shape* (correlated min,
double-distinct-count decorrelation, semi-join chains, scalar-subquery
HAVING) is preserved, with the adaptation documented per query.

Value discipline (CLAUDE.md): money accumulates as DECIMAL(18,2), final
columns cast to DOUBLE on both sides; ratios divide the already-cast
doubles; thresholds are exact-decimal-sum-derived doubles so the
comparison is the identical IEEE value in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import DEC, query
from hadoopxmlextractor_spark.tables import load


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_price) AS min_price FROM cost GROUP BY l_partkey
    )
    SELECT p_partkey, s_name, n_name,
           ROUND(min_price, 4) AS min_unit_price
    FROM part
    JOIN best ON p_partkey = best.l_partkey
    JOIN cost ON cost.l_partkey = best.l_partkey
            AND cost.unit_price = best.min_price
    JOIN supplier ON s_suppkey = cost.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_type = 'STANDARD' AND p_size < 10
    """,
)
def q_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q2 shape (partsupp.ps_supplycost adapted to the observed
    # per-(part,supplier) min unit price from lineitem): correlated-MIN
    # subquery decorrelated into two aggregates joined back on the key.
    # Unit price is one IEEE division per row, so MIN and the equality
    # join-back are bit-exact across engines. Scale: lineitem is
    # semi-joined against the filtered part dim FIRST (prunes ~x% of
    # rows before any aggregation — the oracle's algebraically equal
    # form filters after, same result), then both aggregates and the
    # join-back all shuffle on partkey, which AQE plans as one exchange
    # reused across stages. part/supplier/nation broadcast.
    part = load(spark, sf, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    li = load(spark, sf, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    return (
        cost.join(
            best,
            (cost.l_partkey == best.b_partkey)
            & (cost.unit_price == best.min_price),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round("min_price", 4).alias("min_unit_price"),
        )
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q8 shape: national market share inside a region — an
    # 8-table join tree feeding one conditional-aggregate ratio per
    # year. All four dims (part filtered to one type, nation ×2,
    # region) broadcast; the three fact shuffles are lineitem⨝orders on
    # orderkey then ⨝customer on custkey, exactly the hierarchy AQE
    # keeps at 100 TB. The customer-side nation⨝region pair collapses
    # to a 5-key broadcast filter before touching any fact table.
    part = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey")
    )
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    cust_in_region = cust.join(
        F.broadcast(
            n1.join(region, n1.n_regionkey == region.r_regionkey).select("n1_key")
        ),
        F.col("c_nationkey") == F.col("n1_key"),
        "left_semi",
    )
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           ROUND(CAST(SUM(gross) AS DOUBLE)
                 - 0.5 * CAST(SUM(supply) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2)) AS gross,
             CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS supply
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q9 shape (ps_supplycost adapted to 0.5·p_retailprice — no
    # partsupp table): profit per (supplier nation, order year) over a
    # part-name LIKE filter. Profit is kept as TWO exact decimal sums
    # (gross revenue, retail-value) combined in double space only at
    # the end — a single fused decimal expression would overflow
    # precision bounds differently per engine. The LIKE filter prunes
    # part before its broadcast; fact shuffles are orderkey-only.
    part = load(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    orders = load(spark, sf, "orders")
    nation = load(spark, sf, "nation")
    gross = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    supply = F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(gross).cast("double") - F.lit(0.5) * F.sum(supply).cast("double"),
                2,
            ).alias("sum_profit")
        )
    )


@query(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM val)
    """,
)
def q_q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q11 shape (partsupp value adapted to lineitem revenue):
    # per-part value restricted to one nation's suppliers, kept if
    # above a fraction of the nation's total — the scalar-subquery-
    # over-the-same-aggregate HAVING. The per-part aggregate is
    # persisted and eagerly materialized (CLAUDE.md: AQE races sibling
    # stages into recomputing lineage otherwise) so the total and the
    # filter both reuse ONE shuffle. Values stay DECIMAL through both
    # sums; the 0.001 threshold multiplies the already-cast double, so
    # the comparison is the same IEEE value in DuckDB.
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    supp_in_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    )
    val = (
        li.join(F.broadcast(supp_in_nation), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("v"))
        .persist()
    )
    val.count()  # eager: both consumers below reuse the cached aggregate
    threshold = val.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("t")).first()[0]
    return val.filter(F.col("v").cast("double") > F.lit(threshold)).select(
        "l_partkey", F.col("v").cast("double").alias("part_value")
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q_q12_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q12 shape (l_shipmode adapted to l_returnflag — the
    # synthetic lineitem has no shipmode column): per-group urgent/
    # non-urgent order counts via conditional aggregation. One shuffle
    # joins the date-pruned lineitem to orders on orderkey; the
    # 3-group aggregate is map-side-combined to nearly nothing.
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q15 shape: the revenue "view" computed once, its MAX as a
    # scalar, equality back onto the view. Revenue per supplier is an
    # exact decimal sum cast to double, so MAX and the = comparison are
    # bit-identical across engines. The aggregate is persisted +
    # eagerly counted, then BOTH the max and the filter reuse it; the
    # max-filtered view (≈1 row) broadcasts into the supplier join.
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            )
            .cast("double")
            .alias("total_revenue")
        )
        .persist()
    )
    revenue.count()  # eager: max + filter below reuse one shuffle
    mx = revenue.agg(F.max("total_revenue")).first()[0]
    supp = load(spark, sf, "supplier")
    return (
        supp.join(
            F.broadcast(revenue.filter(F.col("total_revenue") == F.lit(mx))),
            supp.s_suppkey == F.col("l_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q16 shape (partsupp adapted to the observed part↔supplier
    # pairs in lineitem): distinct-supplier counts per part attribute
    # triple, excluding complained-about suppliers via NOT IN → anti
    # join (keys are non-null, so the rewrite is exact). The excluded-
    # supplier set and the filtered part dim both broadcast; the only
    # fact shuffle is the partial-aggregated distinct on the group keys.
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    bad_supp = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0.0)
    li = load(spark, sf, "lineitem").join(
        F.broadcast(bad_supp.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_part_promotion",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND CAST(qty AS DOUBLE) > 40.0)
    """,
)
def q_q20_part_promotion(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q20 shape (partsupp availqty adapted to shipped quantity):
    # a semi-join chain — suppliers in one nation who shipped more than
    # a threshold of some LIKE-filtered part in a year. The per-(supp,
    # part) aggregate shuffles once; the qualifying-supplier set is
    # DISTINCT-reduced to at most |supplier| rows and semi-joined.
    # Quantity sums stay decimal; the 40-unit threshold compares doubles.
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = load(spark, sf, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty").cast("double") > 40.0)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(F.broadcast(shipped), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_supplier",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM l GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
)
def q_q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q21 shape ("kept orders waiting": receiptdate>commitdate
    # adapted to shipped >60 days after order date — no commit/receipt
    # columns). The classic double-correlated EXISTS / NOT EXISTS is
    # rewritten as ONE per-order aggregate (distinct suppliers,
    # distinct late suppliers) joined back — the scale-correct
    # decorrelation: both the aggregate and the join-back shuffle on
    # orderkey, so AQE reuses a single exchange, where the literal
    # EXISTS pair would scan lineitem three times. The count counts
    # late line items of the sole-late supplier, exactly like the
    # reference formulation counts qualifying l1 rows.
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = l.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late"),
    )
    supp = load(spark, sf, "supplier")
    return (
        l.filter(F.col("late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
