"""Every registered query hash-matches its DuckDB oracle (driver t2 replica)."""

from __future__ import annotations

import pytest

from duckdb_hybrid_doc_search_spark.plans import registry

from .oracle_harness import compare

registry._load_all()
NAMES = [n for n, qd in registry.REGISTRY.items() if qd.oracle is not None]
ROWS_ONLY = [n for n, qd in registry.REGISTRY.items() if qd.oracle is None]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    qd = registry.REGISTRY[name]
    compare(spark, sf_dir, qd.spark_fn, qd.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    qd = registry.REGISTRY[name]
    df = qd.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
