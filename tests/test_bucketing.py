"""Bucketed-layout plan gate: same-bucket term join runs with NO shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.bucketing import (bucketed_probe,
                                                            write_bucketed_fts)
from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.bm25 import build_fts_index


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    index = build_fts_index(load_table(spark, sf_dir, "documents"))
    # disable broadcast so the join strategy actually depends on layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_name, d_name = write_bucketed_fts(
            index["postings"], index["docfreq"], n_buckets=4
        )
        probe = bucketed_probe(spark, p_name, d_name, ["spark", "join"])
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        got = probe.groupBy("term").count().collect()
        assert {r.term for r in got} == {"spark", "join"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS fts_postings_bucketed")
        spark.sql("DROP TABLE IF EXISTS fts_docfreq_bucketed")
