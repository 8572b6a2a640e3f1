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


@register("mllib_tfidf_top_terms", oracle=None, bench=False)
def mllib_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mllib_ann.mllib_tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), 50
    )
