"""IVF partitioned layout: pruned scan + result equality with the
query-time IVF operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.index.ivf_layout import (
    ivf_partitioned_topk, probe_cells, write_ivf_partitioned)
from duckdb_hybrid_doc_search_spark.operators.knn import ivf_topk


def test_ivf_partition_pruning_and_equality(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivf")
    write_ivf_partitioned(emb, out)

    # pruning is visible in the scan plan
    probe = probe_cells(spark, out, [0, 50])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # and the partitioned probe returns exactly the query-time IVF result
    want = sorted(
        (r.q_id, r.c_id, r.cos_sim, r.rank)
        for r in ivf_topk(emb, 5, 10).collect()
    )
    got = sorted(
        (r.q_id, r.c_id, r.cos_sim, r.rank)
        for r in ivf_partitioned_topk(spark, out, emb, 5, 10).collect()
    )
    assert got == want
