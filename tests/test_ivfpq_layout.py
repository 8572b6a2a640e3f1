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


def test_append_ivfpq_vectors_incremental(spark, sf_dir, tmp_path):
    """Append equivalence for the CODES layout: base build over a subset
    + frozen-quantizer append of the rest == one-shot build over the
    full table, probe-for-probe (the contract the registered
    ann_ivfpq_append_probe query driver-checks against the one-shot
    oracle)."""
    import pytest

    from duckdb_hybrid_doc_search_spark.index.ivfpq_layout import (
        append_ivfpq_vectors)
    from duckdb_hybrid_doc_search_spark.operators.knn import (
        centroid_pred, derive_nlist, pq_sample_pred)

    emb = load_table(spark, sf_dir, "embeddings")
    # every quantizer slot (centroid or codebook id) must be in the BASE
    # build; the append batch is a disjoint non-slot slice
    nlist = derive_nlist(emb.count())
    is_new = (
        (~centroid_pred("vec_id", nlist)) & (~pq_sample_pred("vec_id"))
        & (F.col("vec_id") % 5 == 3)
    )
    base, new = emb.where(~is_new), emb.where(is_new)
    assert new.count() > 0

    appended = str(tmp_path / "appended")
    write_ivfpq_layout(base, appended, nlist=nlist)
    append_ivfpq_vectors(spark, appended, new)

    oneshot = str(tmp_path / "oneshot")
    write_ivfpq_layout(emb, oneshot)

    got = sorted(map(
        tuple, ivfpq_layout_topk(spark, appended, emb, 5, 10).collect()
    ))
    want = sorted(map(
        tuple, ivfpq_layout_topk(spark, oneshot, emb, 5, 10).collect()
    ))
    assert got == want

    # quantizer-slot ids are rejected (frozen centroid/codebook contract)
    slot = emb.where(pq_sample_pred("vec_id")).limit(1)
    with pytest.raises(ValueError, match="quantizer slots"):
        append_ivfpq_vectors(spark, appended, slot)

    # duplicate vec_ids are rejected (pruned disjointness guard)
    dup = new.limit(3)
    with pytest.raises(ValueError, match="overlaps the layout"):
        append_ivfpq_vectors(spark, appended, dup)


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
