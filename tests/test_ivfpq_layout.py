"""IVF-PQ written layout: pruned codes scan + result equality with the
query-time composed operator (index/ivfpq_layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.index.ivfpq_layout import (
    _side_dir, ivfpq_layout_topk, write_ivfpq_layout)
from duckdb_hybrid_doc_search_spark.operators.knn import PQ_M, ivfpq_topk


def test_ivfpq_layout_pruning_and_equality(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivfpq")
    write_ivfpq_layout(emb, out)

    # the codes scan prunes by cell partition
    probe = spark.read.parquet(out).where(F.col("cell").isin([0, 50]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # codes table carries M rows per vector and NO vector column
    codes = spark.read.parquet(out)
    assert codes.count() == emb.count() * PQ_M
    assert "embedding" not in codes.columns

    # side tables are broadcast-sized and complete
    from duckdb_hybrid_doc_search_spark.operators.knn import pq_sample_pred
    cent = spark.read.parquet(_side_dir(out, "centroids"))
    cb = spark.read.parquet(_side_dir(out, "codebook"))
    n_codewords = emb.where(pq_sample_pred("vec_id")).count()
    assert cent.count() > 0
    assert cb.count() == n_codewords * PQ_M
    assert set(cb.columns) == {"m", "code", "cw"}

    # and the disk probe returns exactly the query-time composed result
    want = sorted(
        (r.q_id, r.c_id, r.adc_dist, r.rank)
        for r in ivfpq_topk(emb, 5, 10).collect()
    )
    got = sorted(
        (r.q_id, r.c_id, r.adc_dist, r.rank)
        for r in ivfpq_layout_topk(spark, out, emb, 5, 10).collect()
    )
    assert got == want


def test_pq_layout_probe_equals_querytime_spec(spark, sf_dir, tmp_path):
    """The layout-backed pure-PQ probe (registered ann_pq_topk path)
    returns exactly the query-time knn.pq_topk spec."""
    from duckdb_hybrid_doc_search_spark.index.ivfpq_layout import (
        pq_layout_recall, pq_layout_topk)
    from duckdb_hybrid_doc_search_spark.operators.knn import (pq_recall,
                                                              pq_topk)

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivfpq")
    write_ivfpq_layout(emb, out)
    want = sorted(map(tuple, pq_topk(emb, 5, 10).collect()))
    got = sorted(
        map(tuple, pq_layout_topk(spark, out, emb, 5, 10).collect())
    )
    assert got == want
    want_r = sorted(map(tuple, pq_recall(emb, 5, 10).collect()))
    got_r = sorted(
        map(tuple, pq_layout_recall(spark, out, emb, 5, 10).collect())
    )
    assert got_r == want_r


def test_pq_layout_rescore_equals_querytime_spec(spark, sf_dir, tmp_path):
    """The layout-backed shortlist+rescore (registered
    ann_pq_rescore_topk path) returns exactly the query-time
    knn.pq_rescore_topk spec."""
    from duckdb_hybrid_doc_search_spark.index.ivfpq_layout import (
        pq_layout_rescore_topk)
    from duckdb_hybrid_doc_search_spark.operators.knn import (
        pq_rescore_topk)

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivfpq")
    write_ivfpq_layout(emb, out)
    want = sorted(map(tuple, pq_rescore_topk(emb, 5, 10).collect()))
    got = sorted(map(
        tuple, pq_layout_rescore_topk(spark, out, emb, 5, 10).collect()
    ))
    assert got == want
