"""Real-model smoke: index fixtures/docs with a REAL SentenceTransformer
and assert retrieval goldens (VERDICT r5 #8).

The container this repo is developed in has no torch/sentence-transformers,
so the real embedding path (models/embedder.py pandas_udf with executor-
side model cache) has never executed here. This tool is the checkable
recipe for the day the wheel lands:

    python tools/real_model_smoke.py [--model sentence-transformers/all-MiniLM-L6-v2]

It indexes ``fixtures/docs`` with the real embedder, runs the golden
queries from ``tests/goldens/real_model_smoke.json`` (each a verbatim
phrase unique to one fixture doc — any real sentence-embedding model
ranks the exact-match chunk top-1), prints one JSON line per query, and
exits non-zero on any miss. The same goldens back the skip-gated pytest
``test_real_models.py::test_real_model_retrieval_goldens``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

GOLDENS = os.path.join(_REPO, "tests", "goldens", "real_model_smoke.json")


def run_smoke(spark, model: str | None = None, db: str | None = None,
              backend: str = "sentence-transformers") -> list[dict]:
    """Index + query with the real model; returns per-query verdicts.

    ``backend="hash"`` runs the identical recipe on the deterministic
    stand-in (identical text still embeds identically, so the exact-match
    goldens hold) — that keeps the recipe's plumbing continuously tested
    in environments without the wheel."""
    from duckdb_hybrid_doc_search_spark.index.builder import index_directories
    from duckdb_hybrid_doc_search_spark.search.doc_engine import (
        DocSearchEngine)

    with open(GOLDENS, encoding="utf-8") as f:
        g = json.load(f)
    model = model or (g["model"] if backend != "hash" else "hash-embedder")
    db = db or os.path.join(tempfile.mkdtemp(prefix="smoke"), "idx")
    index_directories(spark, [os.path.join(_REPO, "fixtures", "docs")], db,
                      embed_backend=backend, embedding_model=model)
    engine = DocSearchEngine(spark, db)
    out = []
    for query, want_suffix in g["queries"].items():
        res = engine.search(query, top_k=3, rerank=False)
        top1 = res[0]["file_path"] if res else None
        out.append({
            "query": query,
            "want_suffix": want_suffix,
            "top1": top1,
            "ok": bool(top1 and top1.endswith(want_suffix)),
        })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    args = ap.parse_args()
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        print("sentence-transformers is not installed; the real-model "
              "smoke cannot run in this environment.", file=sys.stderr)
        return 2

    from duckdb_hybrid_doc_search_spark.session import get_spark

    spark = get_spark("real-model-smoke", cpus=4)
    verdicts = run_smoke(spark, args.model)
    for v in verdicts:
        print(json.dumps(v, ensure_ascii=False))
    return 0 if all(v["ok"] for v in verdicts) else 1


if __name__ == "__main__":
    raise SystemExit(main())
