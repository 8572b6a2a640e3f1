"""Golden end-to-end results (SURVEY.md §5.2.5): index the fixture corpus,
run the fixed query list (FIXTURES.md §D shapes), compare full result JSON
against the checked-in golden. Regenerate intentionally with:

    REGEN_GOLDEN=1 python -m pytest tests/test_golden_search.py -q
"""

from __future__ import annotations

import json
import os
import pathlib

import pytest

from duckdb_hybrid_doc_search_spark.index.builder import index_directories
from duckdb_hybrid_doc_search_spark.search.doc_engine import DocSearchEngine

FIX = pathlib.Path(__file__).parent.parent / "fixtures" / "docs"
GOLDEN = pathlib.Path(__file__).parent / "goldens" / "search_results.json"

QUERIES = [
    {"query": "全文検索", "top_k": 5, "rerank": False},          # D.1 single JP
    {"query": "インデックス 検索", "top_k": 5, "rerank": False},  # D.2 multi JP
    {"query": "final text", "top_k": 5, "rerank": False},        # D.3 ASCII
    {"query": "word777 word778", "top_k": 5, "rerank": False},   # D.4 oversize chunk
    {"query": "zzqxq wvvqy", "top_k": 5, "rerank": False},       # D.5 absent terms
    {"query": "repeated paragraph", "top_k": 1, "rerank": False},  # D.7 k=1
    {"query": "deep nested directory", "top_k": 100, "rerank": False},  # D.7 k=100
    {"query": "real section final text", "top_k": 5, "rerank": True},  # D.8 rerank
]


def run_all(spark, index_dir: str):
    eng = DocSearchEngine(spark, index_dir)
    out = []
    for spec in QUERIES:
        res = eng.search(
            spec["query"], top_k=spec["top_k"], rerank=spec["rerank"],
            remove_prefix=str(FIX),
        )
        out.append(
            {
                "spec": spec,
                "results": [
                    {
                        "file_path": r["file_path"],
                        "header_path": r["header_path"],
                        "line_start": r["line_start"],
                        "line_end": r["line_end"],
                        "score": round(r["score"], 6),
                        "fts_score": r["fts_score"],
                        "vss_score": r["vss_score"],
                    }
                    for r in res
                ],
            }
        )
    return out


def test_golden_search_results(spark, tmp_path):
    out_dir = str(tmp_path / "idx")
    index_directories(spark, [str(FIX)], out_dir)
    got = run_all(spark, out_dir)
    if os.environ.get("REGEN_GOLDEN") or not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=1, ensure_ascii=False))
        pytest.skip("golden (re)generated — commit it and re-run")
    want = json.loads(GOLDEN.read_text())
    assert got == want
