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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spread import spread

MONEY_ROUND = 2
AVG_ROUND = 6

# Money sums run in DECIMAL, not double. Two failure modes of double sums
# against the oracle, both observed: (a) summation order varies across
# engines/partitions; (b) worse, exact sums of fixed-decimal data (prices
# have 2-4 dp) frequently land ON a .xx5 rounding boundary, where Spark
# rounds the shortest decimal repr (HALF_UP -> .xx+1) while DuckDB rounds
# the binary double (usually just below -> .xx). DECIMAL(30,8) sums are
# exact and associative, so both engines agree bit-for-bit; the final
# round+cast back to double is then deterministic.
DEC = "decimal(30,8)"


def money_sum(col, nd: int = MONEY_ROUND):
    return F.round(F.sum(col.cast(DEC)), nd).cast("double")


def dd_money_sum(expr: str, nd: int = MONEY_ROUND) -> str:
    return f"round(sum(CAST(({expr}) AS DECIMAL(30,8))), {nd})::DOUBLE"

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
    # spread: the decimal-cast partial aggregate is the critical path and
    # a single-file scan runs it on one core (r15; no-op at cluster scale)
    return (
        spread(
            lineitem.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF)).select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
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
       {dd_money_sum('l_quantity')} AS sum_qty,
       {dd_money_sum('l_extendedprice')} AS sum_base_price,
       {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dd_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
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
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
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
        .agg(money_sum(revenue).alias("revenue"))
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
       {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
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
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def dd_tpch_q5_sql() -> str:
    return f"""
SELECT n_name,
       {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
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
            money_sum(F.col("o_totalprice")).alias("total_revenue"),
            F.round(F.avg("c_acctbal"), AVG_ROUND).alias("avg_acctbal"),
        )
        .orderBy("n_name")
    )


def dd_customer_nation_stats_sql() -> str:
    return f"""
SELECT n_name,
       count(DISTINCT c_custkey)::BIGINT AS n_customers,
       count(*)::BIGINT AS n_orders,
       {dd_money_sum('o_totalprice')} AS total_revenue,
       round(avg(c_acctbal), {AVG_ROUND}) AS avg_acctbal
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""".strip()


def lineitem_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP grouping-set aggregation (subtotals + grand total).
    (r15: spread() measured a wash here — x3 Expand with one decimal
    aggregate doesn't amortize the round-robin exchange.)"""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def dd_lineitem_rollup_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {dd_money_sum('l_quantity')} AS sum_qty,
       count(*)::BIGINT AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


Q4_DATE_FROM = "1996-01-01"
Q4_DATE_TO = "1996-07-01"
Q4_DISCOUNT = 0.05


def tpch_q4_order_priority(orders: DataFrame,
                           lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery -> LEFT SEMI join, count per
    priority. The semi join never materializes matched lineitem rows."""
    discounted = lineitem.where(F.col("l_discount") > Q4_DISCOUNT).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit(Q4_DATE_FROM))
            & (F.col("o_orderdate") < F.lit(Q4_DATE_TO))
        )
        .join(discounted, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def dd_tpch_q4_sql() -> str:
    return f"""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_FROM}'
  AND o_orderdate < TIMESTAMP '{Q4_DATE_TO}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > {Q4_DISCOUNT})
GROUP BY o_orderpriority ORDER BY o_orderpriority
""".strip()


Q6_DATE_FROM = "1997-01-01"
Q6_DATE_TO = "1998-01-01"


def tpch_q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate pushes to the
    parquet scan, zero joins, one-row result."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q6_DATE_FROM))
            & (F.col("l_shipdate") < F.lit(Q6_DATE_TO))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def dd_tpch_q6_sql() -> str:
    return f"""
SELECT {dd_money_sum('l_extendedprice * l_discount')} AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_FROM}'
  AND l_shipdate < TIMESTAMP '{Q6_DATE_TO}'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""".strip()


Q12_DATE_FROM = "1996-01-01"
Q12_DATE_TO = "1997-01-01"


def tpch_q12_shipmode(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation, keyed on
    return flag since this schema has no ship mode."""
    hi = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q12_DATE_FROM))
            & (F.col("l_shipdate") < F.lit(Q12_DATE_TO))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).alias("high_line_count"),
            F.sum(1 - hi).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def dd_tpch_q12_sql() -> str:
    return f"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_DATE_FROM}'
  AND l_shipdate < TIMESTAMP '{Q12_DATE_TO}'
GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()


Q18_QTY = 150.0


def tpch_q18_large_orders(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, then joins back to
    dimensions; the HAVING runs BEFORE the joins so only qualifying
    orders flow on."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            F.round("o_totalprice", MONEY_ROUND).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def dd_tpch_q18_sql() -> str:
    return f"""
SELECT c_name, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, {MONEY_ROUND}) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {dd_money_sum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dd_money_sum('l_quantity')} > {Q18_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
""".strip()


def lineitem_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations). spread: the
    Expand(x4) + partial aggregate runs over the scan's partitions —
    one task on a single-file input (r15; no-op at cluster scale)."""
    lineitem = spread(
        lineitem.select("l_returnflag", "l_linestatus", "l_extendedprice"))
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


def dd_lineitem_cube_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {dd_money_sum('l_extendedprice')} AS sum_price,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""".strip()


def customer_set_ops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set-operator surface: customers with orders INTERSECT high-balance,
    UNION low-balance EXCEPT orderless — exercised as one query returning
    tagged members."""
    with_orders = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    ).select("c_custkey")
    high_bal = customer.where(F.col("c_acctbal") > 5000).select("c_custkey")
    low_bal = customer.where(F.col("c_acctbal") < 0).select("c_custkey")
    both = with_orders.intersect(high_bal).withColumn("tag", F.lit("active_rich"))
    neg_no_orders = low_bal.exceptAll(with_orders).withColumn(
        "tag", F.lit("negative_inactive")
    )
    return both.unionByName(neg_no_orders).orderBy("tag", "c_custkey")


def dd_customer_set_ops_sql() -> str:
    return """
WITH with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
high_bal AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
low_bal AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
SELECT c_custkey, 'active_rich' AS tag
FROM (SELECT c_custkey FROM customer WHERE c_custkey IN
        (SELECT c_custkey FROM with_orders)
      INTERSECT SELECT c_custkey FROM high_bal)
UNION ALL
SELECT c_custkey, 'negative_inactive' AS tag
FROM (SELECT c_custkey FROM low_bal
      EXCEPT ALL SELECT c_custkey FROM with_orders)
ORDER BY tag, c_custkey
""".strip()


def lineitem_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentiles per return flag (not approx — oracle-comparable;
    at 100 TB swap to percentile_approx and drop the oracle to rows-only)."""
    pcts = [0.25, 0.5, 0.75, 0.95]
    # ONE percentile aggregate over the full probability array: a separate
    # percentile() per column re-accumulates the value multiset 4x (48s vs
    # ~2s at sf0.1)
    arr = F.expr(
        f"percentile(l_extendedprice, array({', '.join(map(str, pcts))}))"
    )
    # (r15: spread() was measured here and LOST — the round-robin
    # exchange of the value column costs more than the single-task
    # percentile inserts save; see OPTIMIZATION_r15.md)
    agg = lineitem.groupBy("l_returnflag").agg(arr.alias("ps"))
    return agg.select(
        "l_returnflag",
        *[
            F.round(F.col("ps")[i], AVG_ROUND).alias(f"p{int(p * 100)}")
            for i, p in enumerate(pcts)
        ],
    ).orderBy("l_returnflag")


def dd_lineitem_quantiles_sql() -> str:
    cols = ",\n       ".join(
        f"round(quantile_cont(l_extendedprice, {p}), {AVG_ROUND}) AS p{int(p*100)}"
        for p in [0.25, 0.5, 0.75, 0.95]
    )
    return f"""
SELECT l_returnflag,
       {cols}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()


Q10_DATE_FROM = "1996-01-01"
Q10_DATE_TO = "1996-04-01"


def tpch_q10_returned_items(customer: DataFrame, orders: DataFrame,
                            lineitem: DataFrame,
                            nation: DataFrame) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(Q10_DATE_FROM))
                & (F.col("o_orderdate") < F.lit(Q10_DATE_TO))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def dd_tpch_q10_sql() -> str:
    return f"""
SELECT c_custkey, c_name, n_name,
       {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_DATE_FROM}'
  AND o_orderdate < TIMESTAMP '{Q10_DATE_TO}'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
""".strip()


Q14_DATE_FROM = "1996-01-01"
Q14_DATE_TO = "1997-01-01"


def tpch_q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: CASE-conditional revenue ratio (promo share)."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q14_DATE_FROM))
            & (F.col("l_shipdate") < F.lit(Q14_DATE_TO))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast(DEC)).cast("double")
                / F.sum(disc.cast(DEC)).cast("double"),
                AVG_ROUND,
            ).alias("promo_revenue_pct"),
            money_sum(disc).alias("total_revenue"),
        )
    )


def dd_tpch_q14_sql() -> str:
    return f"""
SELECT round(100.0 * sum(CAST((CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) AS DECIMAL(30,8)))::DOUBLE
             / sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,8)))::DOUBLE, {AVG_ROUND})
         AS promo_revenue_pct,
       {dd_money_sum('l_extendedprice * (1 - l_discount)')}
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_FROM}'
  AND l_shipdate < TIMESTAMP '{Q14_DATE_TO}'
""".strip()


def tpch_q16_supplier_variety(lineitem: DataFrame, part: DataFrame,
                              supplier: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    (adapted: no partsupp table — supply facts come from lineitem)."""
    return (
        lineitem
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
    )


def dd_tpch_q16_sql() -> str:
    return """
SELECT p_brand, p_type, count(DISTINCT s_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
""".strip()


def scalar_function_showcase(orders: DataFrame) -> DataFrame:
    """The scalar-function surface in one oracle-gated query (SURVEY.md
    §2.5): string ops, date extraction, math, conditionals — every
    expression must agree with DuckDB bit-for-bit after rounding."""
    return orders.select(
        "o_orderkey",
        F.year(F.col("o_orderdate")).alias("order_year"),
        F.month(F.col("o_orderdate")).alias("order_month"),
        F.dayofmonth(F.col("o_orderdate")).alias("order_day"),
        F.quarter(F.col("o_orderdate")).alias("order_quarter"),
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.length(F.col("o_orderstatus")).alias("status_len"),
        F.concat_ws("#", F.col("o_orderstatus"),
                    F.col("o_orderkey").cast("string")).alias("status_key"),
        F.regexp_replace(F.col("o_orderpriority"), "[0-9]-", "").alias(
            "prio_word"
        ),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias(
            "price_dev"
        ),
        F.round(F.sqrt(F.col("o_totalprice")), 6).alias("price_sqrt"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        F.greatest(F.col("o_custkey"), F.col("o_orderkey")).alias("gkey"),
    )


def dd_scalar_function_showcase_sql() -> str:
    return """
SELECT o_orderkey,
       year(o_orderdate)::INT AS order_year,
       month(o_orderdate)::INT AS order_month,
       day(o_orderdate)::INT AS order_day,
       quarter(o_orderdate)::INT AS order_quarter,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderpriority, 1, 1) AS prio_code,
       length(o_orderstatus)::INT AS status_len,
       o_orderstatus || '#' || o_orderkey::VARCHAR AS status_key,
       regexp_replace(o_orderpriority, '[0-9]-', '') AS prio_word,
       round(abs(o_totalprice - 100000.0), 2) AS price_dev,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       (o_orderkey % 7) AS key_mod7,
       greatest(o_custkey, o_orderkey) AS gkey
FROM orders
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
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w),
                MONEY_ROUND).cast("double").alias("running_total"),
    )


def dd_orders_running_revenue_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       round(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER (PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS UNBOUNDED PRECEDING), {MONEY_ROUND})::DOUBLE AS running_total
FROM orders
""".strip()


# --- round 2: the remaining TPC-H shapes expressible on this schema ----------
# (q2/q9/q11/q20 need the partsupp table, which TESTDATA.md does not ship;
# q4/q12/q21 date columns and q13/q22 comment/phone filters are adapted —
# the JOIN/subquery SHAPE of each query is what is preserved and gated.)

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


def tpch_q7_volume_shipping(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, supplier: DataFrame,
                            nation: DataFrame) -> DataFrame:
    """TPC-H Q7: revenue between two nations by direction and year. The
    two nation dims broadcast under different aliases; one fact shuffle."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q7_FROM))
            & (F.col("l_shipdate") < F.lit(Q7_TO))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == Q7_NATION_A)
             & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B)
               & (F.col("cust_nation") == Q7_NATION_A))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def dd_tpch_q7_sql() -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::INT AS l_year,
       {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_FROM}' AND l_shipdate < TIMESTAMP '{Q7_TO}'
  AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""".strip()


Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_FROM = "1996-01-01"
Q8_TO = "1998-01-01"


def tpch_q8_market_share(lineitem: DataFrame, orders: DataFrame,
                         customer: DataFrame, supplier: DataFrame,
                         part: DataFrame, nation: DataFrame,
                         region: DataFrame) -> DataFrame:
    """TPC-H Q8: one nation's market share of a part type in a region, by
    order year — conditional share over a 7-way star join."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    cust_region = (
        customer.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == Q8_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(
        F.lit(0.0)
    )
    return (
        lineitem
        .join(
            F.broadcast(part.where(F.col("p_type") == Q8_TYPE)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(Q8_FROM))
                & (F.col("o_orderdate") < F.lit(Q8_TO))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(
                    (
                        F.sum(nation_vol.cast(DEC))
                        / F.sum(vol.cast(DEC))
                    ).cast("double"),
                    AVG_ROUND,
                )
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def dd_tpch_q8_sql() -> str:
    vol = "l_extendedprice * (1 - l_discount)"
    return f"""
SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
       round((sum(CASE WHEN n1.n_name = '{Q8_NATION}'
                  THEN CAST(({vol}) AS DECIMAL(30,8))
                  ELSE CAST(0 AS DECIMAL(30,8)) END)
              / sum(CAST(({vol}) AS DECIMAL(30,8))))::DOUBLE,
             {AVG_ROUND}) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q8_FROM}'
  AND o_orderdate < TIMESTAMP '{Q8_TO}'
GROUP BY o_year ORDER BY o_year
""".strip()


def tpch_q13_customer_distribution(customer: DataFrame,
                                   orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer, INCLUDING the
    zero-order customers (left outer + count of non-null keys, then a
    second aggregation over the counts)."""
    per_cust = (
        customer.join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def dd_tpch_q13_sql() -> str:
    return """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""".strip()


Q15_FROM = "1996-01-01"
Q15_TO = "1996-04-01"


def tpch_q15_top_supplier(lineitem: DataFrame,
                          supplier: DataFrame) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    'revenue view' is a grouped sub-plan reused for both the max and the
    equality probe (Spark reuses the exchange under AQE)."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q15_FROM))
            & (F.col("l_shipdate") < F.lit(Q15_TO))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def dd_tpch_q15_sql() -> str:
    rev = f"""
  SELECT l_suppkey AS supplier_no,
         {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate < TIMESTAMP '{Q15_TO}'
  GROUP BY l_suppkey
""".rstrip()
    return f"""
WITH revenue AS ({rev}
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""".strip()


Q17_BRAND = "Brand#1"
Q17_MAX_SIZE = 10


def tpch_q17_small_qty_revenue(lineitem: DataFrame,
                               part: DataFrame) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the correlated
    'l_quantity < 0.2 * avg(l_quantity) per part' subquery becomes a
    grouped join. The threshold compare is cross-multiplied
    (5 * qty * n < sum) so it runs in EXACT decimal on both engines with
    no division-rounding boundary."""
    pp = part.where(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") < Q17_MAX_SIZE)
    ).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    small = li.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("agg_pk")
    ).where(
        F.col("l_quantity").cast(DEC) * 5 * F.col("qty_n")
        < F.col("qty_sum")
    )
    return small.agg(
        F.round(
            (F.sum(F.col("l_extendedprice").cast(DEC)) / 7).cast("double"),
            AVG_ROUND,
        ).alias("avg_yearly")
    )


def dd_tpch_q17_sql() -> str:
    return f"""
WITH pp AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{Q17_BRAND}' AND p_size < {Q17_MAX_SIZE}
),
li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN pp ON l_partkey = p_partkey
),
per_part AS (
  SELECT l_partkey AS agg_pk,
         sum(CAST(l_quantity AS DECIMAL(30,8))) AS qty_sum,
         count(*)::BIGINT AS qty_n
  FROM li GROUP BY l_partkey
)
SELECT round((sum(CAST(l_extendedprice AS DECIMAL(30,8))) / 7)::DOUBLE,
             {AVG_ROUND}) AS avg_yearly
FROM li JOIN per_part ON l_partkey = agg_pk
WHERE CAST(l_quantity AS DECIMAL(30,8)) * 5 * qty_n < qty_sum
""".strip()


Q19_TIERS = (
    ("Brand#1", 1, 20, 1.0, 15.0),
    ("Brand#2", 1, 30, 10.0, 25.0),
    ("Brand#3", 1, 50, 20.0, 40.0),
)


def tpch_q19_discounted_revenue(lineitem: DataFrame,
                                part: DataFrame) -> DataFrame:
    """TPC-H Q19: disjunctive multi-tier predicate over the part join —
    exercises OR-of-ANDs pushdown and a single broadcast hash join."""
    cond = None
    for brand, smin, smax, qmin, qmax in Q19_TIERS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(smin, smax))
            & (F.col("l_quantity") >= qmin)
            & (F.col("l_quantity") <= qmax)
        )
        cond = c if cond is None else (cond | c)
    return (
        lineitem.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .where(cond)
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def dd_tpch_q19_sql() -> str:
    tiers = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {smin} AND {smax} "
        f"AND l_quantity BETWEEN {qmin} AND {qmax})"
        for b, smin, smax, qmin, qmax in Q19_TIERS
    )
    return f"""
SELECT {dd_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {tiers}
""".strip()


Q21_NATION = "NATION_3"


def tpch_q21_waiting_suppliers(lineitem: DataFrame, orders: DataFrame,
                               supplier: DataFrame,
                               nation: DataFrame) -> DataFrame:
    """TPC-H Q21 SHAPE (exists + not-exists over the same fact): suppliers
    in one nation that are the ONLY supplier with a returned ('R') line in
    a multi-supplier order. The schema has no commit/receipt dates, so
    'kept waiting' is adapted to 'sole returner'; the semi/anti-join
    structure — the point of Q21 — is preserved."""
    nat_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == Q21_NATION)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    l1 = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "s_name")
        .distinct()
    )
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("l_returnflag").alias("o2_flag"),
    )
    exists_other = l1.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    not_exists_other_r = exists_other.join(
        other.where(F.col("o2_flag") == "R"),
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_anti",
    )
    return (
        not_exists_other_r.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def dd_tpch_q21_sql() -> str:
    return f"""
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey, s_name
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND n_name = '{Q21_NATION}'
    AND o_orderstatus = 'F'
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM l1
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC LIMIT 20
""".strip()


def tpch_q22_global_sales_opportunity(customer: DataFrame,
                                      orders: DataFrame) -> DataFrame:
    """TPC-H Q22 SHAPE: scalar-subquery threshold (avg positive balance)
    + anti join (customers with no orders), grouped by nation key (this
    schema's stand-in for the phone country code)."""
    thresh = customer.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal").cast(DEC) > F.col("avg_bal"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def dd_tpch_q22_sql() -> str:
    return f"""
SELECT c_nationkey, count(*)::BIGINT AS numcust,
       {dd_money_sum('c_acctbal')} AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(30,8)) > (
    SELECT sum(CAST(c_acctbal AS DECIMAL(30,8))) / count(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey ORDER BY c_nationkey
""".strip()


def lineitem_unpivot_measures(lineitem: DataFrame) -> DataFrame:
    """UNPIVOT surface: wide measure columns -> long (measure, value) rows
    via stack() (stays in whole-stage codegen; no shuffle until the agg),
    then per-measure totals."""
    # spread: the 3x stack + decimal partial aggregate is scan-bound (r15)
    long = spread(
        lineitem.select("l_returnflag", "l_quantity", "l_extendedprice",
                        "l_discount")
    ).select(
        "l_returnflag",
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, value)"
        ),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            money_sum(F.col("value")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "measure")
    )


def dd_lineitem_unpivot_sql() -> str:
    return f"""
SELECT l_returnflag, measure, {dd_money_sum('value')} AS total,
       count(*)::BIGINT AS n
FROM (
  SELECT l_returnflag, 'qty' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
)
GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure
""".strip()


HIST_LO = 1
HIST_STEP = 5
HIST_BUCKETS = 10


def part_size_histogram(part: DataFrame) -> DataFrame:
    """Fixed-width histogram with closed-form bucket arithmetic (no
    width_bucket dependency — identical integer math on both engines)."""
    b = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.floor((F.col("p_size") - HIST_LO) / HIST_STEP),
    ).cast("int")
    return (
        part.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p_retailprice"), AVG_ROUND).alias("avg_price"),
        )
        .withColumn("size_from", F.col("bucket") * HIST_STEP + HIST_LO)
        .orderBy("bucket")
    )


def dd_part_size_histogram_sql() -> str:
    b = f"least({HIST_BUCKETS - 1}, floor((p_size - {HIST_LO}) / {HIST_STEP}))::INT"
    return f"""
SELECT {b} AS bucket, count(*)::BIGINT AS n,
       round(avg(p_retailprice), {AVG_ROUND}) AS avg_price,
       ({b} * {HIST_STEP} + {HIST_LO})::INT AS size_from
FROM part GROUP BY bucket ORDER BY bucket
""".strip()


def lineitem_grouping_sets(lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube): exactly
    the flag-only, status-only, and pair subtotals — no grand total, which
    neither rollup nor cube can express alone. Declared via Spark SQL on a
    temp view; Catalyst plans it as one Expand + hash aggregate."""
    # (r15: spread() measured a wash here, like lineitem_rollup)
    lineitem.createOrReplaceTempView("_li_gs")
    return lineitem.sparkSession.sql(f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(l_quantity AS {DEC})), {MONEY_ROUND})
                 AS sum_qty,
               count(*) AS n
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY l_returnflag, l_linestatus
    """).withColumn("sum_qty", F.col("sum_qty").cast("double"))


def dd_lineitem_grouping_sets_sql() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {dd_money_sum('l_quantity')} AS sum_qty, count(*)::BIGINT AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus))
ORDER BY l_returnflag, l_linestatus
""".strip()


RFM_ASOF = "2001-09-01"


def customer_rfm_segments(customer: DataFrame,
                          orders: DataFrame) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) with ntile
    quartiles per dimension — the standard customer-analytics rollup.
    One orders aggregation, then three ``distributed_ntile`` passes over
    the per-customer table. Each quartile is bit-exact with a global
    ``ntile(4)`` (the o_custkey tie-break makes the order total — a
    value-cutoff approximation would split boundary ties differently)
    but runs as a bounded range shuffle, never a single-partition sort;
    recency/frequency tie runs span many customers, so this matters
    even though |customers| ≪ |orders|."""
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            money_sum(F.col("o_totalprice")).alias("monetary"),
        )
        .withColumn(
            "recency_days",
            F.datediff(F.lit(RFM_ASOF), F.col("last_order")),
        )
        # narrow the rows the three checkpointed ntile passes carry
        .select("o_custkey", "recency_days", "frequency", "monetary")
    )
    q = distributed_ntile(
        per_cust, 4, [F.asc("recency_days"), F.asc("o_custkey")],
        out="r_quartile",
    )
    q = distributed_ntile(
        q, 4, [F.desc("frequency"), F.asc("o_custkey")],
        out="f_quartile",
    )
    q = distributed_ntile(
        q, 4, [F.desc("monetary"), F.asc("o_custkey")],
        out="m_quartile",
    )
    return (
        q.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("monetary")).alias("segment_revenue"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


def dd_customer_rfm_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*)::BIGINT AS frequency,
         {dd_money_sum('o_totalprice')} AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT *,
    datediff('day', last_order, TIMESTAMP '{RFM_ASOF}') AS recency_days
  FROM per_cust
),
q AS (
  SELECT *,
    ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC)::INT
      AS r_quartile,
    ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC)::INT
      AS f_quartile,
    ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC)::INT
      AS m_quartile
  FROM scored
)
SELECT r_quartile, f_quartile, m_quartile,
       count(*)::BIGINT AS n_customers,
       {dd_money_sum('monetary')} AS segment_revenue
FROM q GROUP BY r_quartile, f_quartile, m_quartile
ORDER BY r_quartile, f_quartile, m_quartile
""".strip()


ZSCORE_THRESHOLD = 3.0


def supplier_balance_outliers(supplier: DataFrame) -> DataFrame:
    """Z-score anomaly detection over account balances: |z| >= 3 against
    the population mean/stddev. Stats in exact DECIMAL (mean) + one pass;
    z itself rounds after a single double division per row."""
    stats = supplier.agg(
        F.avg("s_acctbal").alias("mu"),
        F.stddev_pop("s_acctbal").alias("sigma"),
    )
    return (
        supplier.crossJoin(F.broadcast(stats))
        .select(
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", MONEY_ROUND).alias("s_acctbal"),
            F.round(
                (F.col("s_acctbal") - F.col("mu")) / F.col("sigma"),
                AVG_ROUND,
            ).alias("z"),
        )
        .where(F.abs(F.col("z")) >= ZSCORE_THRESHOLD)
        .orderBy("s_suppkey")
    )


def dd_supplier_outliers_sql() -> str:
    return f"""
WITH stats AS (
  SELECT avg(s_acctbal) AS mu, stddev_pop(s_acctbal) AS sigma FROM supplier
)
SELECT s_suppkey, s_name, round(s_acctbal, {MONEY_ROUND}) AS s_acctbal,
       round((s_acctbal - mu) / sigma, {AVG_ROUND}) AS z
FROM supplier CROSS JOIN stats
WHERE abs(round((s_acctbal - mu) / sigma, {AVG_ROUND})) >= {ZSCORE_THRESHOLD}
ORDER BY s_suppkey
""".strip()


# --- synthesized partsupp + TPC-H Q2/Q9/Q11/Q20 -----------------------------
#
# TESTDATA ships no partsupp table, so the four TPC-H shapes that need it
# (min-cost correlated subquery, multi-fact profit join, HAVING vs global
# aggregate, nested IN with correlated threshold) run over a partsupp
# SYNTHESIZED deterministically from part x supplier with pure integer
# arithmetic — the oracle runs the IDENTICAL synthesis in SQL, so both
# engines see the same table without any data file.

PS_PER_PART = 4
PS_QTY_MOD = 9_999
PS_COST_MOD = 100_000


def synth_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost).

    PS_PER_PART suppliers per part: ps_suppkey = (p_partkey*7 + i) % S,
    distinct for i < min(4, S); qty/cost are modular-arithmetic functions
    of the key pair. Every expression is 64-bit integer math (one final
    /100.0), bit-identical across engines and scale-free: the build is a
    part-scan crossJoin a 4-row broadcast — no shuffle at any SF.
    """
    spark = part.sparkSession
    gen = spark.range(PS_PER_PART).select(F.col("id").alias("i"))
    n_supp = supplier.agg(F.count(F.lit(1)).alias("n_supp"))
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(gen))
        .crossJoin(F.broadcast(n_supp))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 7 + F.col("i")) % F.col("n_supp"))
            .alias("ps_suppkey"),
        )
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11)
         % PS_QTY_MOD + 1).alias("ps_availqty"),
        (((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7)
          % PS_COST_MOD) / 100.0).alias("ps_supplycost"),
    )


def dd_partsupp_cte() -> str:
    """CTE `partsupp` — the identical synthesis in DuckDB SQL."""
    vals = ", ".join(f"({i})" for i in range(PS_PER_PART))
    return f"""
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 37 + ps_suppkey * 11) % {PS_QTY_MOD} + 1 AS ps_availqty,
         ((ps_partkey * 31 + ps_suppkey * 7) % {PS_COST_MOD}) / 100.0
           AS ps_supplycost
  FROM (
    SELECT p_partkey AS ps_partkey,
           (p_partkey * 7 + i) % s.n_supp AS ps_suppkey
    FROM part
    CROSS JOIN (VALUES {vals}) gen(i)
    CROSS JOIN (SELECT count(*)::BIGINT AS n_supp FROM supplier) s
  )
)
""".strip()


Q2_SIZE = 10
Q2_TYPE = "ECONOMY"
Q2_REGION = "ASIA"
Q2_TOP = 20


def tpch_q2_min_cost_supplier(part: DataFrame, supplier: DataFrame,
                              nation: DataFrame,
                              region: DataFrame) -> DataFrame:
    """TPC-H Q2: for parts of one size/type, the region's minimum-cost
    supplier(s). The correlated `= (SELECT min(ps_supplycost) ...)` is
    decorrelated into a groupBy-min + equi-join — every side except the
    synthesized partsupp is a broadcast dimension, and partsupp itself
    never shuffles (min agg is on its natural ps_partkey grouping)."""
    partsupp = synth_partsupp(part, supplier)
    regional_supp = (
        supplier
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == Q2_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    cost = partsupp.join(
        F.broadcast(regional_supp),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    min_cost = cost.groupBy(
        F.col("ps_partkey").alias("mc_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    wanted = part.where(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    ).select("p_partkey", "p_name")
    return (
        cost.join(F.broadcast(min_cost),
                  (F.col("ps_partkey") == F.col("mc_partkey"))
                  & (F.col("ps_supplycost") == F.col("min_cost")),
                  "inner")
        .join(F.broadcast(wanted), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", MONEY_ROUND).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey",
            F.round("ps_supplycost", MONEY_ROUND).alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOP)
    )


def dd_tpch_q2_sql() -> str:
    return f"""
WITH {dd_partsupp_cte()},
regional AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
cost AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM partsupp JOIN regional ON ps_suppkey = s_suppkey
),
min_cost AS (
  SELECT ps_partkey, min(ps_supplycost) AS mc FROM cost GROUP BY ps_partkey
)
SELECT round(c.s_acctbal, {MONEY_ROUND}) AS s_acctbal, c.s_name, c.n_name,
       c.ps_partkey AS p_partkey,
       round(c.ps_supplycost, {MONEY_ROUND}) AS ps_supplycost
FROM cost c
JOIN min_cost m ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost = m.mc
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_size = {Q2_SIZE} AND p.p_type = '{Q2_TYPE}'
ORDER BY s_acctbal DESC, c.n_name, c.s_name, p_partkey
LIMIT {Q2_TOP}
""".strip()


Q9_NAME_LIKE = "%widget%"


def tpch_q9_product_profit(lineitem: DataFrame, orders: DataFrame,
                           part: DataFrame, supplier: DataFrame,
                           nation: DataFrame) -> DataFrame:
    """TPC-H Q9 product-type profit: lineitem joins BOTH fact-side keys of
    the synthesized partsupp (partkey, suppkey). partsupp is derived from
    broadcast dims, so the only shuffle joins are lineitem<->orders and
    lineitem<->partsupp; profit aggregates per (nation, order-year)."""
    partsupp = synth_partsupp(part, supplier)
    profit = (
        lineitem
        .join(F.broadcast(part.where(F.col("p_name").like(Q9_NAME_LIKE))
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(partsupp,
              (F.col("l_partkey") == F.col("ps_partkey"))
              & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))
             - F.col("ps_supplycost") * F.col("l_quantity")).alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def dd_tpch_q9_sql() -> str:
    return f"""
WITH {dd_partsupp_cte()}
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
       {dd_money_sum('l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_NAME_LIKE}'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""".strip()


Q11_NATION = "NATION_5"
Q11_FRACTION = 0.005


def tpch_q11_important_stock(part: DataFrame, supplier: DataFrame,
                             nation: DataFrame) -> DataFrame:
    """TPC-H Q11 important stock: per-part inventory value within one
    nation, kept only when above a FRACTION of the nation's total — the
    HAVING-vs-global-aggregate shape. The global total is a 1-row
    broadcast crossJoin, so the plan is two aggregations over the same
    derived partsupp slice, no second scan of any base table."""
    partsupp = synth_partsupp(part, supplier)
    national = partsupp.join(
        F.broadcast(
            supplier
            .join(F.broadcast(nation.where(F.col("n_name") == Q11_NATION)),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    per_part = national.groupBy("ps_partkey").agg(
        F.round(F.sum("v"), MONEY_ROUND).alias("value")
    )
    total = national.agg(
        (F.sum("v") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.round(F.col("threshold"), MONEY_ROUND))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


def dd_tpch_q11_sql() -> str:
    return f"""
WITH {dd_partsupp_cte()},
national AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
)
SELECT ps_partkey, round(sum(v), {MONEY_ROUND}) AS value
FROM national
GROUP BY ps_partkey
HAVING round(sum(v), {MONEY_ROUND}) >
       round((SELECT sum(v) * {Q11_FRACTION} FROM national), {MONEY_ROUND})
ORDER BY value DESC, ps_partkey
""".strip()


Q20_NAME_PREFIX = "small%"
Q20_NATION = "NATION_7"
Q20_FROM = "1996-01-01"
Q20_TO = "1997-01-01"


def tpch_q20_promotion_suppliers(lineitem: DataFrame, part: DataFrame,
                                 supplier: DataFrame,
                                 nation: DataFrame) -> DataFrame:
    """TPC-H Q20 potential part promotion: suppliers in one nation with
    excess stock (availqty > half the year's shipped quantity) of any
    name-matched part. The correlated `> (SELECT 0.5*sum ...)` threshold
    is decorrelated into a grouped shipment aggregate equi-joined back on
    (partkey, suppkey); empty correlation groups (NULL sum) drop out of
    the inner join exactly as the NULL comparison drops them in SQL."""
    partsupp = synth_partsupp(part, supplier)
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q20_FROM))
            & (F.col("l_shipdate") < F.lit(Q20_TO))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = (
        partsupp
        .join(F.broadcast(
            part.where(F.col("p_name").like(Q20_NAME_PREFIX))
            .select("p_partkey")),
            F.col("ps_partkey") == F.col("p_partkey"))
        .join(shipped,
              (F.col("ps_partkey") == F.col("l_partkey"))
              & (F.col("ps_suppkey") == F.col("l_suppkey")))
        .where(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier
        .join(F.broadcast(nation.where(F.col("n_name") == Q20_NATION)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"),
              "left_semi")
        .select("s_name", F.round("s_acctbal", MONEY_ROUND)
                .alias("s_acctbal"))
        .orderBy("s_name")
    )


def dd_tpch_q20_sql() -> str:
    return f"""
WITH {dd_partsupp_cte()}
SELECT s_name, round(s_acctbal, {MONEY_ROUND}) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}'
    )
    AND ps_availqty > (
      SELECT 0.5 * sum(l_quantity) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
        AND l_shipdate < TIMESTAMP '{Q20_TO}'
    )
  )
ORDER BY s_name
""".strip()


FUZZY_PROBE = "green steel widget"
FUZZY_TOP = 15


def part_name_fuzzy_match(part: DataFrame) -> DataFrame:
    """Fuzzy string matching surface: Levenshtein distance from a probe
    string to every part name, top-N closest. Built-in JVM levenshtein
    (identical semantics in DuckDB), embarrassingly parallel scan +
    TakeOrderedAndProject — the cheap fuzzy-lookup pattern before
    reaching for n-gram/embedding similarity."""
    return (
        part.select(
            "p_partkey",
            "p_name",
            F.levenshtein(F.col("p_name"), F.lit(FUZZY_PROBE)).alias("dist"),
        )
        .orderBy("dist", "p_partkey")
        .limit(FUZZY_TOP)
    )


def dd_part_name_fuzzy_match_sql() -> str:
    return f"""
SELECT p_partkey, p_name,
       levenshtein(p_name, '{FUZZY_PROBE}')::INT AS dist
FROM part
ORDER BY dist, p_partkey
LIMIT {FUZZY_TOP}
""".strip()


MA_DAYS = 7


def orders_moving_average(orders: DataFrame) -> DataFrame:
    """7-day moving average of daily order revenue: one shuffle to the
    bounded daily table, then a rows-based sliding window ordered by day.
    The window partitions by nothing but runs over |days| rows — bounded
    by the calendar, not the fact table, which is what makes a global
    moving average scale-safe."""
    day = (F.unix_micros(F.col("o_orderdate").cast("timestamp"))
           / F.lit(86_400_000_000)).cast("long")
    daily = (
        orders.select(day.alias("day"), "o_totalprice")
        .groupBy("day")
        .agg(F.round(F.sum("o_totalprice"), MONEY_ROUND).alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-(MA_DAYS - 1), 0)
    return daily.select(
        "day",
        "revenue",
        F.round(F.avg("revenue").over(w), MONEY_ROUND).alias("ma7"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    ).orderBy("day")


def dd_orders_moving_average_sql() -> str:
    return f"""
WITH daily AS (
  SELECT (epoch_us(o_orderdate) // 86400000000) AS day,
         round(sum(o_totalprice), {MONEY_ROUND}) AS revenue
  FROM orders GROUP BY day
)
SELECT day, revenue,
       round(avg(revenue) OVER w, {MONEY_ROUND}) AS ma7,
       count(*) OVER w AS n_window
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN {MA_DAYS - 1} PRECEDING
             AND CURRENT ROW)
ORDER BY day
""".strip()


def customer_first_last_order(orders: DataFrame) -> DataFrame:
    """arg-min/arg-max aggregation surface (max_by/min_by — DuckDB
    arg_max/arg_min): each customer's first and last order key by date
    with the matching totals, one hash aggregate. Ties on o_orderdate are
    broken by the key via a struct comparison so both engines agree."""
    first_key = F.expr(
        "min_by(o_orderkey, struct(o_orderdate, o_orderkey))"
    )
    last_key = F.expr(
        "max_by(o_orderkey, struct(o_orderdate, o_orderkey))"
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            first_key.alias("first_orderkey"),
            last_key.alias("last_orderkey"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


def dd_customer_first_last_order_sql() -> str:
    # this DuckDB build's arg_min/arg_max lack composite comparators;
    # window row_number with the identical (date, key) order is equivalent
    return """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS rf,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
  FROM orders
)
SELECT o_custkey,
       max(CASE WHEN rf = 1 THEN o_orderkey END) AS first_orderkey,
       max(CASE WHEN rl = 1 THEN o_orderkey END) AS last_orderkey,
       count(*)::BIGINT AS n_orders
FROM ranked GROUP BY o_custkey ORDER BY o_custkey
""".strip()


EQUI_DEPTH_BUCKETS = 8


def distributed_ntile(df: DataFrame, nb: int, order: list,
                      out: str = "bucket") -> DataFrame:
    """Append an ``ntile(nb) OVER (ORDER BY <order>)``-equivalent column
    WITHOUT the global single-partition sort that Spark's own ntile plans
    (``WindowExec: No Partition Defined``) — the classic distributed
    ranking decomposition, bit-exact with ntile when the order is total:

    1. ``repartitionByRange`` on the order — each range partition holds a
       contiguous, bounded slice (~|df| / shuffle.partitions rows; with a
       unique tie-break key the range sampler splits evenly even when the
       leading value repeats).
    2. per-partition ``row_number`` (window PARTITIONED by the range id —
       every partition sorts locally, in parallel).
    3. partition row-counts (≤ shuffle.partitions rows) → broadcast
       cumulative offsets; global rank = local rank + offset. The only
       unpartitioned window rides this counts table, bounded by the
       partition count, never by data volume.
    4. bucket from rank via ntile's closed form (first N%k buckets take
       ceil(N/k) rows), all whole-stage-codegen arithmetic.

    The sliced-with-pid projection feeds BOTH the counts branch and the
    rank branch; it is pinned with a lazy ``localCheckpoint`` because
    ``spark_partition_id`` is nondeterministic — two independent
    re-executions of the range exchange (exchange reuse does not fire
    across a nondeterministic projection, and AQE may coalesce the two
    copies differently) could otherwise assign different pids to the two
    branches and corrupt the offsets. The checkpoint materializes the
    narrow ordering projection once (spill-backed, same device as any
    shuffle write) and both branches read it.

    ``order`` entries are Columns (may carry .desc()) or names."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    nparts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    sliced = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    counts = sliced.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # unpartitioned window, but over the COUNTS table: ≤ nparts rows
    # regardless of data volume (the same bounded-rollup pattern as the
    # packing-budget histogram), never the fact table
    wone = Window.orderBy("_pid")
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                wone.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
        F.sum("_cnt").over(
            wone.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )

    wlocal = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        sliced.withColumn("_lrk", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_rk", F.col("_lrk") + F.col("_off"))
    )

    base = F.floor(F.col("_total") / nb)
    rem = F.col("_total") % nb
    head = rem * (base + 1)  # rows covered by the ceil-sized buckets
    bucket = F.when(
        F.col("_rk") <= head,
        F.floor((F.col("_rk") - 1) / (base + 1)) + 1,
    ).otherwise(
        rem + F.floor((F.col("_rk") - head - 1) / base) + 1
    ).cast("int")

    return ranked.withColumn(out, bucket).drop(
        "_pid", "_cnt", "_off", "_total", "_lrk", "_rk"
    )


def lineitem_equi_depth_histogram(lineitem: DataFrame) -> DataFrame:
    """Equi-depth histogram of l_extendedprice: per-bucket row count and
    [lo, hi] bounds — the optimizer-statistics shape (histogram buckets
    with equal mass), bit-exact with the oracle's global ``ntile`` but
    computed with ``distributed_ntile`` (no single-partition sort of the
    fact table; see that docstring for the scale argument)."""
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    return (
        distributed_ntile(
            lineitem.select(*order), EQUI_DEPTH_BUCKETS, order
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), MONEY_ROUND).alias("lo"),
            F.round(F.max("l_extendedprice"), MONEY_ROUND).alias("hi"),
        )
        .orderBy("bucket")
    )


def dd_lineitem_equi_depth_histogram_sql() -> str:
    return f"""
WITH b AS (
  SELECT l_extendedprice,
         ntile({EQUI_DEPTH_BUCKETS}) OVER (
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
         )::INT AS bucket
  FROM lineitem
)
SELECT bucket, count(*)::BIGINT AS n,
       round(min(l_extendedprice), {MONEY_ROUND}) AS lo,
       round(max(l_extendedprice), {MONEY_ROUND}) AS hi
FROM b GROUP BY bucket ORDER BY bucket
""".strip()


def lineitem_geomean_udaf(lineitem: DataFrame) -> DataFrame:
    """Custom aggregate via an Arrow-batched pandas GROUPED_AGG UDF:
    per-returnflag geometric mean of extended price. The UDF computes
    exp(mean(log x)) over each group's Arrow batches — the closed form a
    SQL engine writes as exp(avg(ln(x))), which is exactly the oracle, so
    even the custom-UDAF surface stays hash-checkable.

    Scale note: Spark does NOT partially aggregate grouped-agg pandas
    UDFs — each group's full value stream shuffles to a single task, so
    memory is bounded by the largest group (l_returnflag: 3 groups of
    |lineitem|/3 values each; fine for a demo surface, but an aggregate
    needed on high-cardinality keys at 100 TB should be decomposed into
    built-ins like the oracle's exp(avg(ln(x))) instead)."""
    from pyspark.sql.functions import pandas_udf

    # type-hint form (PandasUDFType is deprecated); PEP 563 stringifies
    # the annotations, so pd must be importable from module globals
    @pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    return (
        lineitem.groupBy("l_returnflag")
        .agg(F.round(gmean("l_extendedprice"), AVG_ROUND).alias("geo_mean"))
        .orderBy("l_returnflag")
    )


def dd_lineitem_geomean_sql() -> str:
    return f"""
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), {AVG_ROUND}) AS geo_mean
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()


PARETO_TOP_SHARE = 0.5


def customer_pareto_share(customer: DataFrame, orders: DataFrame,
                          nation: DataFrame) -> DataFrame:
    """Pareto concentration per nation: customers ranked by revenue inside
    their nation, cumulative revenue share, and how many customers it
    takes to reach half the nation's revenue. The running sum rides
    per-NATION window partitions (bounded), never a global order; output
    is the per-nation summary, not the per-customer detail."""
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), MONEY_ROUND).alias("rev"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "rev")
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy(F.desc("rev"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("n_name")
    ranked = rev.select(
        "n_name",
        "c_custkey",
        F.sum("rev").over(w).alias("cum_rev"),
        F.sum("rev").over(wt).alias("total_rev"),
        F.count(F.lit(1)).over(w).alias("rank"),
    )
    return (
        ranked.where(
            F.col("cum_rev") >= F.lit(PARETO_TOP_SHARE) * F.col("total_rev")
        )
        .groupBy("n_name")
        .agg(
            F.min("rank").alias("customers_to_half_revenue"),
            F.max(F.col("rank")).alias("n_customers"),
        )
        .orderBy("n_name")
    )


def dd_customer_pareto_share_sql() -> str:
    return f"""
WITH rev AS (
  SELECT n_name, c_custkey, round(sum(o_totalprice), {MONEY_ROUND}) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey
),
ranked AS (
  SELECT n_name, c_custkey,
         sum(rev) OVER (PARTITION BY n_name
           ORDER BY rev DESC, c_custkey
           ROWS UNBOUNDED PRECEDING) AS cum_rev,
         sum(rev) OVER (PARTITION BY n_name) AS total_rev,
         count(*) OVER (PARTITION BY n_name
           ORDER BY rev DESC, c_custkey
           ROWS UNBOUNDED PRECEDING) AS rank
  FROM rev
)
SELECT n_name, min(rank) AS customers_to_half_revenue,
       max(rank) AS n_customers
FROM ranked
WHERE cum_rev >= {PARETO_TOP_SHARE} * total_rev
GROUP BY n_name ORDER BY n_name
""".strip()


# --- part_container_arrays ---------------------------------------------------

ARRAY_PROBE_TYPE = "ECONOMY"


def part_type_arrays(part: DataFrame) -> DataFrame:
    """Array-typed analytics surface: per brand, the sorted distinct
    type list (collect_set -> array_sort), its size, a membership
    probe, and the array of per-type counts zipped as 'name:count'
    strings — collection functions (collect_set, array_sort, transform,
    array_contains, array_join) over grouped data, with exact DuckDB
    list-function parity.

    collect_set per brand is bounded by the TYPE DOMAIN (6 values in
    this dataset), not by row count — the precondition for any collect_* at
    scale; unbounded-domain collects belong in explode/aggregate form.

    The emitted columns are all scalars: the driver's pandas
    canonicalizer sort_values()-hashes every column, and a raw
    ``array<string>`` column is unhashable there (the one red row in
    CORRECTNESS_r05). The collection functions are still exercised
    inside the plan — the array just leaves it as ``array_join`` CSV.
    """
    per_bc = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_bc.groupBy("p_brand")
        .agg(
            F.array_sort(F.collect_set("p_type")).alias("types"),
            F.array_sort(
                F.collect_list(
                    F.concat_ws(":", "p_type", F.col("c").cast("string"))
                )
            ).alias("type_counts"),
        )
        .select(
            "p_brand",
            F.array_join("types", ",").alias("types"),
            F.size("types").alias("n_types"),
            F.array_contains("types", ARRAY_PROBE_TYPE)
            .alias("has_probe"),
            F.array_join("type_counts", ",").alias("counts_csv"),
        )
        .orderBy("p_brand")
    )


def dd_part_type_arrays_sql() -> str:
    return f"""
WITH per_bc AS (
  SELECT p_brand, p_type, count(*)::BIGINT AS c
  FROM part GROUP BY p_brand, p_type
)
SELECT p_brand,
       list_aggregate(list_sort(list(DISTINCT p_type)),
                      'string_agg', ',') AS types,
       len(list_sort(list(DISTINCT p_type)))::INT AS n_types,
       list_contains(list(DISTINCT p_type),
                     '{ARRAY_PROBE_TYPE}') AS has_probe,
       list_aggregate(
         list_sort(list(p_type || ':' || c::VARCHAR)),
         'string_agg', ',') AS counts_csv
FROM per_bc GROUP BY p_brand ORDER BY p_brand
""".strip()


# --- customer_balance_percentiles --------------------------------------------

PCTL_CONT = 0.5
PCTL_DISC = 0.9


def customer_balance_percentiles(customer: DataFrame) -> DataFrame:
    """percentile_cont vs percentile_disc per market segment — the two
    ANSI percentile semantics side by side (interpolated midpoint vs an
    actual data value). One hash aggregate per segment; both engines
    implement the ANSI definitions so parity is exact after rounding."""
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.expr(f"percentile_cont({PCTL_CONT}) "
                       "WITHIN GROUP (ORDER BY c_acctbal)"),
                4,
            ).alias("median_cont"),
            F.round(
                F.expr(f"percentile_disc({PCTL_DISC}) "
                       "WITHIN GROUP (ORDER BY c_acctbal)"),
                4,
            ).alias("p90_disc"),
        )
        .orderBy("c_mktsegment")
    )


def dd_customer_balance_percentiles_sql() -> str:
    return f"""
SELECT c_mktsegment, count(*)::BIGINT AS n,
       round(quantile_cont(c_acctbal, {PCTL_CONT}), 4) AS median_cont,
       round(quantile_disc(c_acctbal, {PCTL_DISC}), 4) AS p90_disc
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""".strip()


# --- orders_calendar_breakdown -----------------------------------------------


def orders_calendar_breakdown(orders: DataFrame) -> DataFrame:
    """Reporting-calendar surface: per (year, quarter) order counts,
    DECIMAL revenue, distinct ISO weeks and distinct weekdays touched —
    the calendar-function parity check (weekofyear is ISO-8601 in BOTH
    engines; day-of-week numbering differs by one and distinct-count is
    bijection-invariant, so the oracle needs no adjustment). One hash
    aggregate over derived date parts; Catalyst folds the extracts into
    the scan projection."""
    d = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.year(d).alias("o_year"), F.quarter(d).alias("o_quarter")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
            F.countDistinct(F.weekofyear(d)).alias("n_iso_weeks"),
            F.countDistinct(F.dayofweek(d)).alias("n_weekdays"),
        )
        .orderBy("o_year", "o_quarter")
    )


def dd_orders_calendar_breakdown_sql() -> str:
    return f"""
SELECT year(o_orderdate) AS o_year, quarter(o_orderdate) AS o_quarter,
       count(*)::BIGINT AS n_orders,
       {dd_money_sum('o_totalprice')} AS revenue,
       count(DISTINCT weekofyear(o_orderdate))::BIGINT AS n_iso_weeks,
       count(DISTINCT dayofweek(o_orderdate))::BIGINT AS n_weekdays
FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter
""".strip()


# --- customer_gini_by_nation -------------------------------------------------

GINI_ROUND = 6


def customer_gini_by_nation(customer: DataFrame,
                            nation: DataFrame) -> DataFrame:
    """Wealth-concentration profile: Gini coefficient of (shifted
    non-negative) customer account balances per nation, via the sorted
    closed form G = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n.

    The rank window partitions per nation — the same bounded per-slice
    shape as customer_pareto_share; no global sort. Balances are
    shifted by the global minimum (broadcast scalar) so the Gini is
    well-defined on the non-negative scale both engines compute
    identically."""
    minb = customer.agg(F.min("c_acctbal").alias("minb"))
    shifted = customer.crossJoin(F.broadcast(minb)).select(
        "c_custkey", "c_nationkey",
        (F.col("c_acctbal") - F.col("minb")).alias("x"),
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("x"), F.asc("c_custkey")
    )
    ranked = shifted.withColumn("i", F.row_number().over(w))
    per_nation = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    gini = (
        F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
        - (F.col("n") + 1.0) / F.col("n")
    )
    return (
        per_nation.join(F.broadcast(nation),
                        per_nation["c_nationkey"] == nation["n_nationkey"])
        .select(
            "n_name", "n",
            F.round(gini, GINI_ROUND).alias("gini"),
        )
        .orderBy("n_name")
    )


def dd_customer_gini_by_nation_sql() -> str:
    return f"""
WITH minb AS (SELECT min(c_acctbal) AS mb FROM customer),
ranked AS (
  SELECT c_nationkey, c_acctbal - mb AS x,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal - mb ASC, c_custkey ASC) AS i
  FROM customer CROSS JOIN minb
),
per_nation AS (
  SELECT c_nationkey, count(*)::BIGINT AS n, sum(x) AS sx,
         sum(i * x) AS six
  FROM ranked GROUP BY c_nationkey
)
SELECT n_name, n,
       round(2.0 * six / (n * sx) - (n + 1.0) / n, {GINI_ROUND}) AS gini
FROM per_nation JOIN nation ON c_nationkey = n_nationkey
ORDER BY n_name
""".strip()


# --- orders_ship_latency -----------------------------------------------------

LAT_ROUND = 4


def orders_ship_latency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Operational latency metric: days from order placement to line
    shipment, aggregated per order month — count, mean, exact p50/p90
    (percentile_cont). The orders<->lineitem join shuffles both sides on
    the order key (the natural co-partitioning; with bucketed tables it
    is exchange-free, see index/bucketing.py), and the month aggregate
    is calendar-bounded."""
    j = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .alias("days"),
    )
    return (
        j.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("days"), LAT_ROUND).alias("avg_days"),
            F.round(
                F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY days)"),
                LAT_ROUND,
            ).alias("p50_days"),
            F.round(
                F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY days)"),
                LAT_ROUND,
            ).alias("p90_days"),
        )
        .orderBy("month")
    )


def dd_orders_ship_latency_sql() -> str:
    return f"""
WITH j AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS month,
         datediff('day', o_orderdate, l_shipdate) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT month, count(*)::BIGINT AS n_lines,
       round(avg(days), {LAT_ROUND}) AS avg_days,
       round(quantile_cont(days, 0.5), {LAT_ROUND}) AS p50_days,
       round(quantile_cont(days, 0.9), {LAT_ROUND}) AS p90_days
FROM j GROUP BY month ORDER BY month
""".strip()
