"""Invariants for search-result enrichment (search/results.py)."""

from __future__ import annotations

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.index.fts_layout import ensure_fts_layout
from duckdb_hybrid_doc_search_spark.operators import bm25
from duckdb_hybrid_doc_search_spark.plans.doc_search_queries import (
    QUERY,
    TOP_K,
)
from duckdb_hybrid_doc_search_spark.search import results


def _setup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    idx = ensure_fts_layout(spark, docs, sf_dir)
    return docs, idx


def test_snippets_cover_topk_and_contain_match(spark, sf_dir):
    docs, idx = _setup(spark, sf_dir)
    rows = results.bm25_snippets(idx, docs, QUERY, TOP_K).collect()
    assert len(rows) == TOP_K
    assert [r["rank"] for r in rows] == list(range(1, TOP_K + 1))
    for r in rows:
        assert 0 < len(r["snippet"]) <= results.SNIPPET_LEN
        if r["matched_term"] is not None:
            assert r["matched_term"] in r["snippet"].lower() or len(
                r["snippet"]
            ) == results.SNIPPET_LEN  # match may sit past the cut when the
            # first occurrence is within the leading context margin


def test_snippet_scores_match_bm25_topk(spark, sf_dir):
    docs, idx = _setup(spark, sf_dir)
    snip = {
        r["doc_id"]: r["score"]
        for r in results.bm25_snippets(idx, docs, QUERY, TOP_K).collect()
    }
    topk = {
        r["doc_id"]: r["score"]
        for r in bm25.bm25_topk_from_index(idx, QUERY, TOP_K).collect()
    }
    assert snip == topk


def test_facets_count_full_candidate_set(spark, sf_dir):
    docs, idx = _setup(spark, sf_dir)
    from duckdb_hybrid_doc_search_spark.models.tokenizer import tokenize_query

    n_cands = bm25.bm25_scores(idx, tokenize_query(QUERY)).count()
    rows = results.bm25_facets(idx, docs, QUERY).collect()
    lang_rows = [r for r in rows if r["lang"] is not None]
    src_rows = [r for r in rows if r["source"] is not None]
    assert sum(r["n_hits"] for r in lang_rows) == n_cands
    assert sum(r["n_hits"] for r in src_rows) == n_cands
    best = max(r["best_score"] for r in rows)
    topk = bm25.bm25_topk_from_index(idx, QUERY, 1).collect()
    assert best == topk[0]["score"]
