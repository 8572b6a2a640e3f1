"""SQ8 written layout (index/sq8_layout.py): probe equality with the
query-time operator, codes domain, and the compression claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.index.sq8_layout import (
    sq8_layout_topk, write_sq8_layout)
from duckdb_hybrid_doc_search_spark.operators.knn import sq8_topk

K, NQ = 5, 10


def test_sq8_layout_probe_equals_querytime_spec(spark, sf_dir, tmp_path):
    """Quantize-then-store-then-dequantize returns exactly the
    query-time quantize-inline results (the stored smallint IS the
    floor() integer the inline formula computes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "sq8")
    write_sq8_layout(emb, out)
    want = sorted(map(tuple, sq8_topk(emb, K, NQ).collect()))
    got = sorted(map(
        tuple, sq8_layout_topk(spark, out, emb, K, NQ).collect()
    ))
    assert got == want


def test_sq8_layout_codes_domain_and_size(spark, sf_dir, tmp_path):
    """Stored codes are smallint 0..255, one per dimension, for every
    vector — and the codes table is materially smaller than the raw
    embeddings column it replaces."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "sq8")
    write_sq8_layout(emb, out)
    codes = spark.read.parquet(out)
    assert dict(codes.dtypes)["q8"] == "array<smallint>"
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    bad = codes.select(
        F.explode("q8").alias("q")
    ).where((F.col("q") < 0) | (F.col("q") > 255)).count()
    assert bad == 0
    n_codes = codes.select(F.size("q8").alias("s")).agg(
        F.sum("s")
    ).first()[0]
    assert n_codes == n * dim


def test_sq8_reconstruction_error_bound(spark, sf_dir, tmp_path):
    """Floor quantization is one-sided and bounded: for every stored
    dimension, deq <= x and x - deq <= (mx - mn)/255 — the grid-cell
    guarantee that makes the 4x tier near-lossless."""
    import numpy as np

    from duckdb_hybrid_doc_search_spark.index.sq8_layout import _side_dir

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "sq8")
    write_sq8_layout(emb, out)
    stats = spark.read.parquet(_side_dir(out, "stats")).first()
    mn = np.array(stats["mn_l"])
    mx = np.array(stats["mx_l"])
    step = (mx - mn) / 255.0
    codes = {
        r["vec_id"]: np.array(r["q8"], dtype=np.float64)
        for r in spark.read.parquet(out).collect()
    }
    eps = 1e-9
    for r in emb.select("vec_id", "embedding").collect():
        x = np.array(r["embedding"], dtype=np.float64)
        q = codes[r["vec_id"]]
        deq = np.where(mx == mn, mn, mn + q / 255.0 * (mx - mn))
        err = x - deq
        assert (err >= -eps).all(), r["vec_id"]
        assert (err <= step + eps).all(), r["vec_id"]
