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
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF))
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
    """ROLLUP grouping-set aggregation (subtotals + grand total)."""
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
    """CUBE grouping sets (all subtotal combinations)."""
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
