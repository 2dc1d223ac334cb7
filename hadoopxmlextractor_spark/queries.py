"""Named analytics queries + DuckDB oracle SQL (the driver contract).

Each query demonstrates one operator category from SURVEY.md §2.3 as an
idiomatic DataFrame plan; the paired ANSI-SQL string is the independent
DuckDB oracle. Column names and value representations are aligned on
both sides (aliases everywhere; doubles aggregated as DECIMAL or rounded
identically; timestamps reduced to exact integer/date forms).

Scale notes are inline per query: which side broadcasts, where the
shuffles are, and why the plan survives a 100× scale-up.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.tables import load

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, QueryFn] = {}
ORACLE: Dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # Tripwires for silent registry corruption: a duplicate name
        # would shadow an earlier query, and a stacked @query pair (two
        # decorators, one def) binds one function to two names while
        # silently unregistering the other function — both bugs the
        # driver would surface only as a confusing hash mismatch.
        if name in QUERIES:
            raise ValueError(f"query {name!r} registered twice")
        if fn.__name__ != f"q_{name}":
            raise ValueError(
                f"query {name!r} bound to {fn.__name__} (expected q_{name}) — "
                "check for stacked @query decorators"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


DEC = "decimal(18,2)"

# ---------------------------------------------------------------------------
# Scan / filter / projection
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_quantity > 45
    """,
)
def q_scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    # Filter + projection reach the parquet scan (PushedFilters/ReadSchema):
    # at 100 TB only 4 of 11 columns are read and row groups are skipped
    # on the shipdate/quantity stats. Price passes through as the raw
    # parquet double — bit-identical on both sides (canonical-types rule).
    return (
        load(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") >= "1998-01-01") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("price"),
            "l_returnflag",
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q1 shape: partial (map-side) aggregation shrinks 100 TB of
    # lineitem to |flag×status| rows before the single shuffle. Sums are
    # exact DECIMAL internally; the FINAL cast to DOUBLE makes both
    # sides canonicalize identically (correctly-rounded nearest double
    # of the same exact value — see CLAUDE.md canonical-types rule).
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
        F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1) - F.col("l_discount")).cast(DEC)
        ).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_rollup",
    """
    SELECT n_name, c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    # nation is tiny → broadcast; rollup adds no extra shuffle over the
    # base aggregation (Spark expands grouping sets in one exchange).
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    # PRE-AGGREGATE before the cube (r10, closes the r09 agg_cube
    # drift watch item — adjudicated real CPU, cpu/wall 0.92): a bare
    # .cube() Expands every input row 4x BEFORE the partial aggregate,
    # so the hash-agg does 4·|lineitem| updates; aggregating to the
    # |distinct keys| base first (one ordinary map-side-combined
    # exchange) and cubing THAT leaves the Expand on ~6 rows.
    # Decimal sums re-aggregate exactly (sum of decimal partials),
    # count re-aggregates as sum(n) — row- and type-identical to the
    # single-level cube (asserted in tests). At 100 TB this is the
    # difference between expanding the fact table 4x and expanding a
    # handful of group rows; measured 2.3x at sf0.1 (1.27s -> 0.55s).
    base = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
        )
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n0").alias("n"),
            F.sum("sq").cast("double").alias("sum_qty"),
        )
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_approx_distinct",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_2pct
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # approx_count_distinct = HyperLogLog++: mergeable sketch, no exact
    # distinct shuffle — the 100 TB-safe way to count uniques. The
    # estimate itself is approximate, so the hashed output is the GATE
    # VERDICT: exact count + a within-2% flag. Spark's HLL++ is
    # deterministic for fixed input, and the flag comparison is pure
    # int64 (|approx−exact|·50 ≤ exact), so the boolean is hash-stable;
    # measured error is ≤0.67% across sf0.001/0.01/0.1 (3× headroom).
    # The oracle is exact SQL: DuckDB's exact distinct + literal TRUE.
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users")) * 50
                <= F.col("exact_users")
            ).alias("approx_within_2pct"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_agg",
    """
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_inner_agg(spark: SparkSession, sf: str) -> DataFrame:
    # orders⨝customer is the big join (shuffle on custkey); nation is
    # broadcast so the second join adds no shuffle.
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


@query(
    "join_broadcast_dim",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    # Fact×dim: part is millions of rows at 100 TB-scale lineitem but
    # still broadcastable (or AQE converts to broadcast); no shuffle of
    # the 100 TB fact table for the join, only for the tiny aggregate.
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
       AND o_orderdate >= TIMESTAMP '2001-01-01'
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    # left_semi: probe side streams, no row multiplication, build side
    # deduplicates on the fly — preferable to join+distinct at scale.
    cust = load(spark, sf, "customer")
    big = load(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
    )
    """,
)
def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    recent = load(spark, sf, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf: str) -> DataFrame:
    r1 = load(spark, sf, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load(spark, sf, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(F.broadcast(r2))
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@query(
    "join_range",
    """
    SELECT p_brand, COUNT(*) AS n_close
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
)
def q_join_range(spark: SparkSession, sf: str) -> DataFrame:
    # Equi-key carries the join; the range predicate is a cheap residual
    # filter on the matched pairs — no O(n²) band join.
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey)
            & (li.l_quantity >= part.p_size - 2)
            & (li.l_quantity <= part.p_size + 2),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_close"))
    )


@query(
    "join_asof",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) AS purchase_ms,
           epoch_ms(CAST(c.ts AS TIMESTAMP)) AS last_click_ms
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    # As-of join via union + running last() — ONE shuffle on user_id,
    # state O(1) per user. The naive inequality-join alternative is
    # O(clicks×purchases) per user and dies at scale; this formulation
    # is the standard Spark pattern for point-in-time correctness.
    from hadoopxmlextractor_spark.operators.temporal import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, "user_id", "ts").select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.unix_millis(F.col("asof_match.ts")).alias("last_click_ms"),
    )


@query(
    "join_asof_forward",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) AS purchase_ms,
           epoch_ms(CAST(c.ts AS TIMESTAMP)) AS next_click_ms
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    # Forward as-of: the EARLIEST click at-or-after each purchase —
    # same single-shuffle running-window plan, frame reversed.
    from hadoopxmlextractor_spark.operators.temporal import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, "user_id", "ts", direction="forward").select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.unix_millis(F.col("asof_match.ts")).alias("next_click_ms"),
    )


@query(
    "join_interval_overlap",
    """
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, c.click_id,
           epoch_ms(p.s) AS purchase_ms, epoch_ms(c.s) AS click_ms
    FROM p JOIN c
      ON p.user_id = c.user_id AND p.s <= c.e AND c.s <= p.e
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    # Interval-overlap join via time-bin candidates: each 30-minute
    # window explodes into the hour bins it covers, the join is an
    # EQUI-join on (user, bin) with the exact overlap predicate as the
    # verify — cost tracks overlap density, never |purchases|x|clicks|
    # per user like the theta join the oracle runs.
    from hadoopxmlextractor_spark.operators.temporal import interval_join

    ev = load(spark, sf, "events")
    mk = lambda t, idc: (
        ev.filter(F.col("event_type") == t).select(
            F.col("event_id").alias(idc),
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
        )
    )
    joined = interval_join(
        mk("purchase", "event_id"), mk("click", "click_id"), "user_id",
        bin_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_id_r").alias("click_id"),
        F.unix_millis("start").alias("purchase_ms"),
        F.unix_millis("start_r").alias("click_ms"),
    )


@query(
    "join_asof_tolerance",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) AS purchase_ms,
           CASE WHEN CAST(c.ts AS TIMESTAMP)
                     >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
                THEN epoch_ms(CAST(c.ts AS TIMESTAMP)) END AS last_click_1h_ms
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    # Tolerance as-of (pandas merge_asof semantics): the nearest
    # candidate is the ONLY candidate, so discarding an out-of-window
    # nearest equals "no match within tolerance" — a post-match filter,
    # not a range join.
    from hadoopxmlextractor_spark.operators.temporal import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        purchases, clicks, "user_id", "ts", tolerance_seconds=3600
    ).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.unix_millis(F.col("asof_match.ts")).alias("last_click_1h_ms"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             o_totalprice AS price,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    # Top-k per group via row_number: Spark inserts a partial top-k sort
    # (WindowGroupLimit) before the shuffle, so only k rows per group
    # move — scales to arbitrarily large groups.
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "topk_global",
    """
    SELECT o_orderkey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-10 then a single-driver merge of 10×partitions rows — no
    # global sort of the table.
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q_set_union(spark: SparkSession, sf: str) -> DataFrame:
    a = (
        load(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    f = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(o)


@query(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def q_set_except(spark: SparkSession, sf: str) -> DataFrame:
    all_c = load(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    recent = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return all_c.exceptAll(recent).distinct()


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@query(
    "scalar_string",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, ':', c_name) AS tagged,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    """,
)
def q_scalar_string(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


@query(
    "scalar_date",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


@query(
    "scalar_math_case",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS net_price,
           ABS(CAST(l_quantity AS INT) - 25) AS qty_dev,
           CAST(l_quantity AS INT) % 7 AS qty_mod,
           CASE WHEN l_discount > 0.05 THEN 'high' WHEN l_discount > 0.02 THEN 'mid'
                ELSE 'low' END AS discount_band
    FROM lineitem
    """,
)
def q_scalar_math_case(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC), 2
        ).cast("double").alias("net_price"),
        F.abs(F.col("l_quantity").cast("int") - 25).alias("qty_dev"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("discount_band"),
    )


@query(
    "scalar_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@query(
    "array_explode",
    """
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 5) AS val
    FROM embeddings
    WHERE vec_id < 10
    """,
)
def q_array_explode(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 10)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "raw")
    ).select("vec_id", "pos", F.round(F.col("raw").cast("double"), 5).alias("val"))


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@query(
    "subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    # The scalar subquery's AVG runs over DECIMAL so the threshold is
    # identical on both sides (a raw double AVG is summation-order
    # dependent and could flip edge rows).
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice AS price
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        """
    )


@query(
    "subquery_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "nation").createOrReplaceTempView("nation")
    load(spark, sf, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        """
    )


# ---------------------------------------------------------------------------
# Pivot / events
# ---------------------------------------------------------------------------


@query(
    "pivot_event_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    # Explicit pivot values → single pass, no values-discovery job.
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "events_tumbling_window",
    """
    SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_ms,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    # Batch equivalent of the Structured Streaming tumbling window (the
    # streaming variant lives in streaming/; same logical plan). The
    # window start is emitted as epoch millis (canonical-types rule:
    # never a raw TIMESTAMP output column).
    return (
        load(spark, sf, "events")
        .groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("window_start_ms"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


@query(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM marked
    """,
)
def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    # Gap-based sessionization: lag + running sum, one shuffle on
    # user_id. (Streaming variant: session_window in streaming/.)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load(spark, sf, "events")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))) > 30 * 60 * 1000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return marked.select(
        "user_id", "event_id", F.sum("new_session").over(wrun).alias("session_id")
    )
