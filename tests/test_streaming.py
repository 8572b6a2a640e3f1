"""Structured Streaming windowed agg must equal its batch specification."""

from __future__ import annotations

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.events import windowed_agg
from duckdb_hybrid_doc_search_spark.streaming.events import (
    run_streaming_windowed_agg,
)


def test_streaming_windowed_agg_matches_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in windowed_agg(load_table(spark, sf_dir, "events")).collect()
    }
    stream = {
        tuple(r) for r in run_streaming_windowed_agg(spark, sf_dir).collect()
    }
    assert stream == batch
    assert len(batch) > 0
