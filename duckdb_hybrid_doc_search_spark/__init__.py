"""PySpark-native hybrid document-search and text-analytics engine.

A brand-new engine with the query and data-processing capabilities of
``upamune/duckdb-hybrid-doc-search`` (see SURVEY.md), re-expressed Spark-first:

- index = Parquet tables (documents / postings / docfreq / docstats /
  corpus_stats / embeddings / meta) instead of a single DuckDB file,
- BM25 and cosine scoring = pure Spark SQL expressions (whole-stage codegen),
- tokenization / embedding / reranking = Arrow-batched ``pandas_udf``s,
- plus the generalized LLM-data-pipeline operators (dedup, similarity join,
  text analytics) designed for 100 TB scale.
"""

__version__ = "0.1.0"
