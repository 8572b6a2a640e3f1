"""Rerankers (reference models/reranker.py:56-122 + searcher.py:261-310).

- ``overlap``: deterministic token-overlap scorer (FIXTURES.md §C) —
  score = |distinct query tokens ∩ distinct doc tokens| / |distinct query
  tokens|, computed as a pure Spark SQL expression (array_intersect), so it
  is oracle-comparable and JVM-side.
- ``cross-encoder``: real CrossEncoder behind an import-try with the
  reference's full fallback ladder: load failure or scoring failure keeps
  the ORIGINAL scores (searcher.py:272, :287-296); input text truncated to
  2048 chars (reranker.py:86); batch 8 (reranker.py:60).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import RERANK_TRUNCATE_CHARS
from ..functions.text import dd_tokenize, tokenize

_CE_MODELS: dict[str, object] = {}


def overlap_rerank_expr(text_col: Column, query_terms: list[str]) -> Column:
    """Token-overlap rerank score over the 2048-char-truncated text."""
    qterms = sorted(set(query_terms))
    if not qterms:
        # mirror doc_engine._rerank's `if not qset` guard: an empty query
        # scores 0.0 instead of NULL (Spark x/0) / inf (DuckDB x/0.0)
        return F.lit(0.0)
    truncated = F.substring(text_col, 1, RERANK_TRUNCATE_CHARS)
    inter = F.array_intersect(
        F.array_distinct(tokenize(truncated)),
        F.array(*[F.lit(t) for t in qterms]),
    )
    return F.size(inter).cast("double") / F.lit(float(len(qterms)))


def dd_overlap_rerank(text_expr: str, query_terms: list[str]) -> str:
    qterms = sorted(set(query_terms))
    if not qterms:
        return "0.0"
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in qterms)
    truncated = f"substr({text_expr}, 1, {RERANK_TRUNCATE_CHARS})"
    toks = dd_tokenize(truncated)
    return (
        f"(len(list_intersect(list_distinct({toks}), [{qlist}]))::DOUBLE"
        f" / {float(len(qterms))})"
    )


def cross_encoder_scores(query: str, texts: list[str],
                         model_name: str, batch_size: int = 8) -> list[float] | None:
    """Driver-side CrossEncoder scoring; None on any failure (reference
    contract: searcher keeps original scores, searcher.py:287-296)."""
    try:
        from sentence_transformers import CrossEncoder  # type: ignore
    except ImportError:
        return None
    try:
        model = _CE_MODELS.get(model_name)
        if model is None:
            model = _CE_MODELS[model_name] = CrossEncoder(model_name)
        pairs = [(query, t[:RERANK_TRUNCATE_CHARS]) for t in texts]
        return [float(s) for s in model.predict(pairs, batch_size=batch_size)]
    except Exception:
        return None
