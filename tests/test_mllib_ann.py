"""MLlib LSH variants: measured recall against the exact oracle-gated
operators (approximation quality is a number, not a hope)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.models.embedder import hash_embed_text
from duckdb_hybrid_doc_search_spark.operators import dedup, knn, mllib_ann


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(docs).collect()
    }
    # token-set (1-gram) exact pairs differ from 3-gram shingle pairs;
    # compare against MLlib on the SAME granularity: tokens
    approx = {
        (r.doc_a, r.doc_b)
        for r in mllib_ann.mllib_minhash_pairs(docs, 0.5).collect()
    }
    assert approx, "MinHashLSH produced no candidate pairs"
    # every 3-gram near-dup pair (much stricter) should be recalled by the
    # token-level approximate join
    recall = len(exact & approx) / max(1, len(exact))
    assert recall >= 0.9, f"recall {recall:.2f} of {len(exact)} exact pairs"


def test_brp_lsh_topk_recall_vs_exact_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = hash_embed_text("spark vector join fast merge")
    k = 10
    exact_ids = [
        r.doc_id for r in knn.cosine_distance_topk(emb, qvec, k).collect()
    ]
    approx_ids = [
        r.doc_id
        for r in mllib_ann.mllib_brp_neighbors(emb, qvec, k).collect()
    ]
    overlap = len(set(exact_ids) & set(approx_ids)) / k
    assert overlap >= 0.5, f"BRP-LSH top-{k} overlap {overlap:.2f}"


def test_tfidf_top_terms_sane(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    top = mllib_ann.mllib_tfidf_top_terms(docs, 20).collect()
    assert len(top) == 20
    assert all(r.tfidf_sum >= 0 for r in top)
    # ubiquitous terms get idf ~0 -> must not dominate
    terms = [r.term for r in top]
    df_counts = (
        docs.select(F.explode(F.array_distinct(
            F.split(F.lower("text"), "[^a-z0-9]+"))).alias("t"))
        .groupBy("t").count().collect()
    )
    n_docs = docs.count()
    ubiquitous = {r.t for r in df_counts if r["count"] == n_docs}
    assert not (set(terms) & ubiquitous)


def test_hard_negatives_all_labels_differ(spark, sf_dir):
    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.knn import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    rows = hard_negatives(emb, 5, 10).collect()
    assert len(rows) == 50  # 10 queries x k=5 (enough off-label vectors)
    for r in rows:
        assert r.c_label != r.q_label
        assert 1 <= r.rank <= 5
    # per query: ranks are exactly 1..5 and similarities non-increasing
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
