"""Bucketed index layout — the co-location strategy for 100 TB probes.

`postings` and `docfreq` written with the same bucket count on `term`
hash-co-locate: a term-keyed join between them needs NO shuffle exchange
(and with sortBy, no sort) — the probe-side plan is scan+join only. On a
cluster this is the difference between a per-query shuffle of the postings
slice and none at all. tests/test_bucketing.py asserts the exchange-free
plan shape.

Bucketed tables require the session catalog (`saveAsTable`); plain
parquet `save()` cannot record bucketing metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_fts(postings: DataFrame, docfreq: DataFrame,
                       n_buckets: int = 8,
                       prefix: str = "fts") -> tuple[str, str]:
    """Write postings+docfreq bucketed by term; returns the table names."""
    p_name, d_name = f"{prefix}_postings_bucketed", f"{prefix}_docfreq_bucketed"
    (
        postings.write.mode("overwrite")
        .bucketBy(n_buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(p_name)
    )
    (
        docfreq.write.mode("overwrite")
        .bucketBy(n_buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(d_name)
    )
    return p_name, d_name


def bucketed_probe(spark: SparkSession, p_name: str, d_name: str,
                   query_terms: list[str]) -> DataFrame:
    """Term-filtered postings⋈docfreq over the bucketed tables — the
    co-located join the layout exists for."""
    from pyspark.sql import functions as F

    p = spark.table(p_name).where(F.col("term").isin(query_terms))
    d = spark.table(d_name).where(F.col("term").isin(query_terms))
    return p.join(d, "term")
