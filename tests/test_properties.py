"""Property-based invariants (SURVEY.md §5.2.4) for the score kernels.

These run the pure-Python mirrors of the Spark expressions (same formulas,
same constants) under hypothesis — the Spark<->DuckDB parity suite pins the
expressions themselves, these pin their mathematical behavior.
"""

from __future__ import annotations

import math

from hypothesis import given
from hypothesis import strategies as st

from duckdb_hybrid_doc_search_spark.config import (BM25_B, BM25_K1,
                                                   FUSION_WEIGHT_SINGLE)
from duckdb_hybrid_doc_search_spark.models.tokenizer import (
    jp_heuristic_tokenize, tokenize_query)


def fuse(fts: float | None, vss: float | None) -> float:
    if fts is not None and vss is not None:
        return (fts + vss) / 2.0
    if fts is not None:
        return fts * FUSION_WEIGHT_SINGLE
    if vss is not None:
        return vss * FUSION_WEIGHT_SINGLE
    return 0.0


def bm25_term(tf: int, df: int, n_docs: int, dl: int, avgdl: float) -> float:
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tfn = tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )
    return idf * tfn


scores = st.one_of(st.none(), st.floats(0, 100, allow_nan=False))


@given(scores, scores, st.floats(0, 100, allow_nan=False))
def test_fusion_monotonic_per_branch(fts, vss, delta):
    """Raising either branch's score never lowers the fused score."""
    base = fuse(fts, vss)
    if fts is not None:
        assert fuse(fts + delta, vss) >= base
    if vss is not None:
        assert fuse(fts, vss + delta) >= base


@given(st.floats(0, 100, allow_nan=False), st.floats(0, 100, allow_nan=False))
def test_fusion_bounded_by_branches(fts, vss):
    """Both-branch fusion is the mean — between min and max."""
    f = fuse(fts, vss)
    assert min(fts, vss) - 1e-9 <= f <= max(fts, vss) + 1e-9


@given(st.integers(1, 50), st.integers(1, 100), st.integers(1, 500),
       st.integers(1, 2000))
def test_bm25_monotonic_in_tf(tf, df, extra_docs, dl):
    """More occurrences of a term never lower its contribution."""
    n = df + extra_docs
    avgdl = 100.0
    assert bm25_term(tf + 1, df, n, dl, avgdl) >= bm25_term(
        tf, df, n, dl, avgdl
    )


@given(st.integers(1, 50), st.integers(2, 100), st.integers(1, 500),
       st.integers(1, 2000))
def test_bm25_antitone_in_df(tf, df, extra_docs, dl):
    """Rarer terms score at least as high as common ones."""
    n = df + extra_docs
    avgdl = 100.0
    assert bm25_term(tf, df - 1, n, dl, avgdl) >= bm25_term(
        tf, df, n, dl, avgdl
    )


@given(st.integers(1, 50), st.integers(1, 100), st.integers(1, 500))
def test_bm25_shorter_docs_score_higher(tf, df, extra_docs):
    n = df + extra_docs
    assert bm25_term(tf, df, n, 50, 100.0) >= bm25_term(tf, df, n, 200, 100.0)


@given(st.text(max_size=200))
def test_tokenize_idempotent_and_clean(text):
    toks = tokenize_query(text)
    assert all(t for t in toks)
    # re-tokenizing the joined tokens is a fixpoint
    assert tokenize_query(" ".join(toks)) == toks


@given(st.text(max_size=120))
def test_jp_tokenizer_total(text):
    """The CJK-bigram tokenizer never crashes and never emits empties."""
    toks = jp_heuristic_tokenize(text)
    assert all(t for t in toks)


# --- chunker cross-implementation equivalence --------------------------------

_md_line = st.one_of(
    st.text(alphabet="ab #`~-\t", max_size=12),
    st.sampled_from([
        "# H1", "## H2", "### H3 ###", "#### deep", "```", "~~~", "---",
        "", "text body", "  indented", "#not a header", "# ", "para one",
    ]),
)


@given(st.lists(_md_line, max_size=40))
def test_chunker_oracle_matches_engine_chunker(lines):
    """The independent oracle chunker (plans/chunker_oracle.py — backward
    scans, line masks) and the engine chunker (operators/chunker_core.py —
    forward stack, regexes) must agree on arbitrary markdown."""
    from duckdb_hybrid_doc_search_spark.operators.chunker_core import (
        split_markdown)
    from duckdb_hybrid_doc_search_spark.plans.chunker_oracle import chunk_file

    content = "\n".join(lines)
    engine = [
        (c.header_path, c.line_start, c.line_end, c.content)
        for c in split_markdown("/f.md", content)
    ]
    oracle = [(r[2], r[3], r[4], r[5]) for r in chunk_file("/f.md", content)]
    assert engine == oracle
