"""Streaming index maintenance: the file stream re-converges the written
index as markdown files land/are edited, embeddings for unchanged chunks
stay byte-identical, and search sees the new content."""

from __future__ import annotations

import pathlib
import shutil

from duckdb_hybrid_doc_search_spark.index.builder import index_directories
from duckdb_hybrid_doc_search_spark.search.doc_engine import DocSearchEngine
from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
    run_streaming_index_update)

FIX = pathlib.Path(__file__).parent.parent / "fixtures" / "docs"


def test_stream_reconverges_index(spark, tmp_path):
    corpus = tmp_path / "corpus"
    shutil.copytree(FIX, corpus)
    out = str(tmp_path / "idx")
    index_directories(spark, [str(corpus)], out)
    emb_before = {
        r.doc_id: list(r.embedding)
        for r in spark.read.parquet(f"{out}/embeddings").collect()
    }

    q = run_streaming_index_update(
        spark, str(corpus), out, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()  # initial files -> idempotent reconverge
        (corpus / "streamed_new.md").write_text(
            "# Streamed\n\nzanzibar quokka paragraph arrives via stream\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    docs_after = spark.read.parquet(f"{out}/documents")
    assert docs_after.where(
        docs_after.content.contains("zanzibar quokka")
    ).count() == 1
    # unchanged chunks kept byte-identical embeddings
    emb_after = {
        r.doc_id: list(r.embedding)
        for r in spark.read.parquet(f"{out}/embeddings").collect()
    }
    for doc_id, vec in emb_before.items():
        assert emb_after.get(doc_id) == vec
    # and the engine finds the streamed doc
    eng = DocSearchEngine(spark, out)
    hits = eng.search("zanzibar quokka", top_k=3, rerank=False)
    assert any("streamed_new.md" in r["file_path"] for r in hits)
    eng.close()
