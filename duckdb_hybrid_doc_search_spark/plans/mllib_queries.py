"""MLlib approximate-similarity registrations (rows-only: seeded-random
hash families aren't DuckDB-reproducible; recall vs the exact operators is
asserted in tests/test_mllib_ann.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.catalog import load_table
from ..models.embedder import hash_embed_text
from ..operators import mllib_ann
from .registry import register

_QVEC = hash_embed_text("spark vector join fast merge")


@register("mllib_minhash_pairs", oracle=None, bench=False)
def mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mllib_ann.mllib_minhash_pairs(
        load_table(spark, sf_dir, "documents"), 0.5
    )


@register("mllib_brp_topk", oracle=None, bench=False)
def mllib_brp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mllib_ann.mllib_brp_neighbors(
        load_table(spark, sf_dir, "embeddings"), _QVEC, 10
    )


def _dd_tfidf_oracle(top_n: int = 50) -> str:
    """MLlib's CountVectorizer+IDF reduces to closed form per term:
    sum over docs of tf*idf = idf * total_tf, with Spark's
    idf = ln((m+1)/(df+1)) — so even the MLlib wrapper is exactly
    oracle-checkable (vocab is untruncated at this corpus size)."""
    from ..functions.text import dd_tokenize

    toks = dd_tokenize("text")
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
  GROUP BY doc_id, term
),
m AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
stats AS (
  SELECT term, sum(tf)::BIGINT AS total_tf, count(*)::BIGINT AS df
  FROM tf GROUP BY term
)
SELECT term,
       round(ln((n_docs + 1.0) / (df + 1.0)) * total_tf, 6) AS tfidf_sum
FROM stats, m
ORDER BY tfidf_sum DESC, term ASC LIMIT {top_n}
""".strip()


@register("mllib_tfidf_top_terms", oracle=_dd_tfidf_oracle(50), bench=False)
def mllib_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mllib_ann.mllib_tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), 50
    )


@register("mllib_brp_recall", oracle=None, bench=False)
def mllib_brp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation quality of the MLlib BRP-LSH path, recorded in the
    driver artifacts each round (rows-only: seeded-random hash family):
    one row (k, n_hit, recall_at_k) vs the exact cosine top-k for _QVEC."""

    from ..operators import knn

    k = 10
    emb = load_table(spark, sf_dir, "embeddings")
    exact = knn.cosine_distance_topk(emb, _QVEC, k).select("doc_id")
    approx = mllib_ann.mllib_brp_neighbors(emb, _QVEC, k).select("doc_id")
    n_hit = exact.join(approx, "doc_id", "left_semi").count()
    return spark.createDataFrame(
        [(k, n_hit, round(n_hit / k, 6))],
        "k int, n_hit int, recall_at_k double",
    )


@register("mllib_minhash_recall", oracle=None, bench=False)
def mllib_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair recall of MLlib MinHashLSH against the EXACT
    shingle-Jaccard join at the same 0.5 threshold (rows-only): one row
    (n_exact, n_candidates, n_hit, recall). Token-set granularities differ
    (tokens vs 3-shingles), so this measures the pipeline as users run it:
    did the approximate path surface the true near-dup pairs?"""

    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.dedup_ngram_jaccard(docs).select("doc_a", "doc_b")
    approx = mllib_ann.mllib_minhash_pairs(docs, 0.5).select(
        "doc_a", "doc_b"
    )
    n_exact = exact.count()
    n_cand = approx.count()
    n_hit = exact.join(approx, ["doc_a", "doc_b"], "left_semi").count()
    recall = round(n_hit / n_exact, 6) if n_exact else 1.0
    return spark.createDataFrame(
        [(n_exact, n_cand, n_hit, recall)],
        "n_exact long, n_candidates long, n_hit long, recall double",
    )
