"""Streaming DOCUMENT ingestion: the dedup family's stream face over the
documents table (streaming/events.py covers the events stream).

At 100 TB, corpus ingestion is a continuous stream of shards; the
keep-one-per-fingerprint decision is a streaming aggregation whose state
store IS the fingerprint index — RocksDB-backed, partitioned by the
fingerprint hash, surviving restarts via checkpoint. The bounded file
source here drives the same stateful plan to completion so the final
state can be hash-gated against the batch oracle (dedup_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file stream over the documents parquet (one file = one
    batch). In production this is the shard-arrival queue."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def streaming_doc_exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep-one-per-content-fingerprint as a STREAMING AGGREGATION: the
    aggregation state (fp -> cnt, keep_id) is exactly the persistent
    fingerprint store an ingestion pipeline maintains; arriving
    duplicates bump cnt and never displace the kept id (min). Final
    state == the batch dedup_exact result (operators/dedup.py:89) —
    that equality is the oracle gate.
    """
    return (
        docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def run_streaming_doc_dedup(spark: SparkSession, sf_dir: str,
                            query_name: str = "doc_dedup") -> DataFrame:
    """Drive the bounded stream to completion; complete-mode memory sink
    exposes the final fingerprint state as a DataFrame."""
    stream = streaming_doc_exact_dedup(read_documents_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
