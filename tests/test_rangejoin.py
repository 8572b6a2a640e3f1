"""Binned range join: exact equality with the naive cross-join filter,
no duplicate pairs, and plan stays a bucket equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.functions.rangejoin import bin_range_join
from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.events import (sessionize,
                                                             ts_micros)


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_bin_range_join_equals_naive(spark):
    iv = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 60), (3, 200, 1000), (4, -30, 5)],
        "iv_id long, lo long, hi long",
    )
    pts = spark.createDataFrame(
        [(10, 0), (11, 55), (12, 100), (13, 150), (14, 999), (15, -10)],
        "pt_id long, p long",
    )
    got = bin_range_join(iv, pts, "lo", "hi", "p", bucket_width=64).select(
        "iv_id", "pt_id"
    )
    naive = iv.crossJoin(pts).where(
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    ).select("iv_id", "pt_id")
    assert _pairs(got) == _pairs(naive)
    # no duplicates by construction (point matches in exactly its bucket)
    assert len(_pairs(got)) == got.distinct().count()


def test_bin_range_join_sessions_vs_keyed_join(spark, sf_dir):
    """Real data: binned no-key join over session windows reproduces the
    keyed range join's pair count for a single user's sessions."""
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events).where(F.col("user_id") == 1).select(
        F.col("session_no").alias("iv_id"), "start_us", "end_us"
    )
    pts = events.where(F.col("user_id") == 1).select(
        F.col("event_id").alias("pt_id"), ts_micros(events).alias("us")
    )
    got = bin_range_join(
        sess, pts, "start_us", "end_us", "us",
        bucket_width=6 * 3600 * 1_000_000,
    )
    naive = sess.crossJoin(pts).where(
        (F.col("us") >= F.col("start_us")) & (F.col("us") <= F.col("end_us"))
    )
    assert got.count() == naive.count() > 0


def test_bucket_join_is_equi_join_in_plan(spark):
    iv = spark.createDataFrame([(1, 0, 100)], "iv_id long, lo long, hi long")
    pts = spark.createDataFrame([(10, 5)], "pt_id long, p long")
    df = bin_range_join(iv, pts, "lo", "hi", "p", 16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
