"""Spark's built-in session_window must agree with the engine's manual
gap-sessionization (lag + running sum) — two independent implementations
of the same semantics checking each other."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.events import (SESSION_GAP_US,
                                                             sessionize,
                                                             ts_micros)


def test_builtin_session_window_matches_manual(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    manual = {
        (r.user_id, r.n_events, r.start_us, r.end_us)
        for r in sessionize(events).collect()
    }
    gap_s = SESSION_GAP_US // 1_000_000
    builtin = (
        events.withColumn("tse", F.timestamp_micros(ts_micros(events)))
        .groupBy(
            F.session_window("tse", f"{gap_s} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("tse")).alias("start_us"),
            F.unix_micros(F.max("tse")).alias("end_us"),
        )
    )
    got = {
        (r.user_id, r.n_events, r.start_us, r.end_us)
        for r in builtin.collect()
    }
    assert got == manual


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """Sketch surface: HLL approx distinct vs exact — relative error within
    the documented default rsd (5%)."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.05