"""General relational operators over the star schema (SURVEY.md §2.4).

The reference has no general joins/aggregates/windows — Spark SQL provides
them natively; these queries document and gate that surface (TPC-H-shaped
aggregation, multi-way joins, window functions, rollup) with DuckDB oracles.

Scale notes baked into each plan:
- fact-side filters appear before joins (Catalyst pushes them into the scan;
  `PushedFilters` visible in explain),
- dimension sides (region/nation/customer/supplier at these ratios) are
  broadcast — no shuffle of the fact table for those joins,
- aggregations are partial (map-side) before the single hash shuffle,
- top-k uses TakeOrderedAndProject, never a full sort.

Money sums round to 2 decimals, averages/ratios to 6 — both engines sum
float64 in different orders; rounding absorbs the last-bit drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MONEY_ROUND = 2
AVG_ROUND = 6

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"
Q5_REGION = "ASIA"
Q5_DATE_FROM = "1996-01-01"
Q5_DATE_TO = "1997-01-01"
TOP_ORDERS_PER_CUST = 3


def tpch_q1(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-filter-partial-agg, one shuffle."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), MONEY_ROUND).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), MONEY_ROUND).alias("sum_base_price"),
            F.round(F.sum(disc_price), MONEY_ROUND).alias("sum_disc_price"),
            F.round(F.sum(charge), MONEY_ROUND).alias("sum_charge"),
            F.round(F.avg("l_quantity"), AVG_ROUND).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), AVG_ROUND).alias("avg_price"),
            F.round(F.avg("l_discount"), AVG_ROUND).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def dd_tpch_q1_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), {MONEY_ROUND}) AS sum_qty,
       round(sum(l_extendedprice), {MONEY_ROUND}) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), {MONEY_ROUND}) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {MONEY_ROUND}) AS sum_charge,
       round(avg(l_quantity), {AVG_ROUND}) AS avg_qty,
       round(avg(l_extendedprice), {AVG_ROUND}) AS avg_price,
       round(avg(l_discount), {AVG_ROUND}) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()


def tpch_q3(customer: DataFrame, orders: DataFrame,
            lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shipping priority: two broadcast-able dim joins into the
    fact, group on order, top-10 by revenue."""
    revenue = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    return (
        lineitem.where(F.col("l_shipdate") > F.lit(Q3_DATE))
        .join(
            orders.where(F.col("o_orderdate") < F.lit(Q3_DATE)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.where(F.col("c_mktsegment") == Q3_SEGMENT)
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, MONEY_ROUND).alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def dd_tpch_q3_sql() -> str:
    return f"""
SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), {MONEY_ROUND}) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '{Q3_DATE}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND c_mktsegment = '{Q3_SEGMENT}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
""".strip()


def tpch_q5(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
            supplier: DataFrame, nation: DataFrame,
            region: DataFrame) -> DataFrame:
    """TPC-H Q5 local-supplier revenue: 6-way join; every dimension side is
    broadcast, the lineitem<->orders join is the only shuffle."""
    return (
        lineitem
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(Q5_DATE_FROM))
                & (F.col("o_orderdate") < F.lit(Q5_DATE_TO))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == Q5_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                MONEY_ROUND,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def dd_tpch_q5_sql() -> str:
    return f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), {MONEY_ROUND}) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_FROM}'
  AND o_orderdate < TIMESTAMP '{Q5_DATE_TO}'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""".strip()


def top_orders_per_customer(orders: DataFrame) -> DataFrame:
    """Top-N-per-group via window row_number (no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_ORDERS_PER_CUST)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", MONEY_ROUND).alias("o_totalprice"),
            "rn",
        )
    )


def dd_top_orders_per_customer_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, {MONEY_ROUND}) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= {TOP_ORDERS_PER_CUST}
""".strip()


def customer_nation_stats(customer: DataFrame, nation: DataFrame,
                          orders: DataFrame) -> DataFrame:
    """Dim-dim-fact join + multi-agg per nation."""
    return (
        orders
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), MONEY_ROUND).alias("total_revenue"),
            F.round(F.avg("c_acctbal"), AVG_ROUND).alias("avg_acctbal"),
        )
        .orderBy("n_name")
    )


def dd_customer_nation_stats_sql() -> str:
    return f"""
SELECT n_name,
       count(DISTINCT c_custkey)::BIGINT AS n_customers,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), {MONEY_ROUND}) AS total_revenue,
       round(avg(c_acctbal), {AVG_ROUND}) AS avg_acctbal
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""".strip()


def lineitem_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP grouping-set aggregation (subtotals + grand total)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), MONEY_ROUND).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def dd_lineitem_rollup_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), {MONEY_ROUND}) AS sum_qty,
       count(*)::BIGINT AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


def orders_running_revenue(orders: DataFrame) -> DataFrame:
    """Running per-customer revenue — cumulative window frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
        F.round(F.sum("o_totalprice").over(w), MONEY_ROUND).alias("running_total"),
    )


def dd_orders_running_revenue_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS UNBOUNDED PRECEDING), {MONEY_ROUND}) AS running_total
FROM orders
""".strip()
