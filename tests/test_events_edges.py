"""Event-operator edge cases: schema-adaptive event time and per-key
tolerant map extraction (both engines must agree on malformed inputs)."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.events import (
    dd_props_map_stats_sql, props_map_stats, ts_micros)


def test_ts_micros_adapts_to_encoding(spark):
    from pyspark.sql import functions as F

    # nanos-long encoding (nanosAsLong read of timestamp[ns] parquet)
    ns = spark.createDataFrame(
        [(1, 1_700_000_000_123_456_789)], "event_id long, ts long"
    )
    got_ns = ns.select(ts_micros(ns).alias("us")).collect()[0].us
    assert got_ns == 1_700_000_000_123_456  # truncated, not rounded
    # timestamp encoding under the UTC session zone
    t = spark.createDataFrame(
        [(1,)], "event_id long"
    ).select("event_id", F.timestamp_micros(F.lit(got_ns)).alias("ts"))
    assert t.select(ts_micros(t).alias("us")).collect()[0].us == got_ns


def test_props_map_stats_per_key_tolerant(spark):
    """A non-numeric value nulls only ITS entry; dotted keys resolve —
    and DuckDB's oracle agrees on the same malformed fixture."""
    rows = [(1, '{"a": 5, "b": "oops"}'), (2, '{"a": 7, "x.y": 3}'),
            (3, '{"b": 2}')]
    df = spark.createDataFrame(rows, "event_id long, props string")
    got = sorted(tuple(r) for r in props_map_stats(df).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, '{\"a\": 5, \"b\": \"oops\"}'), "
        "(2, '{\"a\": 7, \"x.y\": 3}'), "
        "(3, '{\"b\": 2}')) t(event_id, props)"
    )
    want = sorted(con.execute(dd_props_map_stats_sql()).fetchall())
    assert got == want
    assert ("a", 2, 5, 7, 12) in got        # both numeric entries kept
    assert ("b", 2, 2, 2, 2) in got         # "oops" nulls one entry only
    assert ("x.y", 1, 3, 3, 3) in got       # dotted key resolves


def test_audience_overlap_invariants(spark, sf_dir):
    """Jaccard bounds, intersection <= min audience, and pair count =
    C(|types present|, 2)."""
    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.events import \
        audience_overlap

    ev = load_table(spark, sf_dir, "events")
    rows = audience_overlap(ev).collect()
    types = {r.type_a for r in rows} | {r.type_b for r in rows}
    n = len(types)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.type_a < r.type_b
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_both <= min(r.n_a, r.n_b)


def test_hll_error_small_at_default_rsd(spark, sf_dir):
    """The recorded HLL rel_err must stay within ~3x the configured rsd
    (it is a quality metric, not garbage)."""
    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.events import \
        hll_distinct_error

    ev = load_table(spark, sf_dir, "events")
    for r in hll_distinct_error(ev).collect():
        assert r.rel_err <= 0.15, (r.event_type, r.rel_err)
