"""Queries expressed through the spark.sql TEXT interface.

Everything else in plans/ uses the DataFrame API; these registrations
prove the SQL surface is the same engine — the scale-factor tables are
registered as temp views and the query is one ANSI SQL string that both
Spark and DuckDB execute (modulo dialect casts). Catalyst treats the two
APIs identically, so plan-shape guarantees carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.catalog import TABLES, load_table
from .registry import register


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_SQL_REVENUE = """
SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10
""".strip()


@register(
    "sql_nation_revenue",
    oracle="""
SELECT n_name, count(DISTINCT c_custkey)::BIGINT AS n_customers,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10
""".strip(),
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top nations by order revenue — pure spark.sql text over temp views."""
    _ensure_views(spark, sf_dir)
    return spark.sql(_SQL_REVENUE)


_SQL_RANKED = """
SELECT c_mktsegment, c_custkey, bal, seg_rank
FROM (
  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal,
         dense_rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(c_acctbal, 2) DESC) AS seg_rank
  FROM customer
)
WHERE seg_rank <= 3
ORDER BY c_mktsegment, seg_rank, c_custkey
""".strip()


@register(
    "sql_segment_top_balances",
    oracle="""
SELECT c_mktsegment, c_custkey, bal, seg_rank
FROM (
  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal,
         dense_rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(c_acctbal, 2) DESC)::BIGINT
           AS seg_rank
  FROM customer
)
WHERE seg_rank <= 3
ORDER BY c_mktsegment, seg_rank, c_custkey
""".strip(),
)
def sql_segment_top_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-ranked top balances per segment — windowed SQL text form."""
    _ensure_views(spark, sf_dir)
    return spark.sql(_SQL_RANKED)


_SQL_LATERAL = """
SELECT n_name, c_custkey, c_acctbal, t.o_orderkey, t.top_price
FROM customer
JOIN nation ON c_nationkey = n_nationkey,
LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS top_price
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 1
) AS t
WHERE c_acctbal > 9900
ORDER BY n_name, c_custkey
""".strip()


@register(
    "sql_lateral_top_order",
    oracle="""
SELECT n_name, c_custkey, c_acctbal, t.o_orderkey, t.top_price
FROM customer
JOIN nation ON c_nationkey = n_nationkey,
LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS top_price
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 1
) AS t
WHERE c_acctbal > 9900
ORDER BY n_name, c_custkey
""".strip(),
)
def sql_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (each high-balance customer's single
    top order) — the exact text runs on BOTH engines; Catalyst decorrelates
    the lateral into a ranked join, no per-row re-execution."""
    _ensure_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL)
