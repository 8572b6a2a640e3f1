"""Partition-local graph-ANN: determinism, self-match preservation, and a
recall floor vs the exact scan (SURVEY.md §4.1(c))."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.hnsw import (
    build_nsw, hnsw_recall_vs_exact, hnsw_topk, search_nsw)


def test_nsw_graph_exact_on_tiny_corpus():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(64, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    adj = build_nsw(vecs)
    # with ef >= n the greedy search degenerates to exact: top-3 by cosine
    for qi in (0, 17, 63):
        got = list(search_nsw(vecs, adj, vecs[qi], 3, ef=64))
        sims = vecs @ vecs[qi]
        want = list(np.lexsort((np.arange(64), -sims))[:3])
        assert got == want


def test_hnsw_topk_deterministic_and_self_hit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(tuple(r) for r in hnsw_topk(emb, 5, 10).collect())
    b = sorted(tuple(r) for r in hnsw_topk(emb, 5, 10).collect())
    assert a == b
    self_ids = {r[0] for r in a if r[0] == r[1]}
    assert self_ids == set(range(10))  # every query finds itself


def test_hnsw_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    row = hnsw_recall_vs_exact(emb, 5, 10).collect()[0]
    assert row.n_self_hits == 10
    assert row.mean_recall >= 0.6, row
