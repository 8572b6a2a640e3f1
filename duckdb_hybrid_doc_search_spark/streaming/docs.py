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


def run_streaming_incremental_dedup(spark: SparkSession, sf_dir: str,
                                    query_name: str = "inc_dedup",
                                    ) -> DataFrame:
    """The full ingestion-dedup LOOP as a structured stream: arriving
    batch documents (doc_id % BATCH_MOD == 0) flow through foreachBatch;
    each micro-batch is decided against the WRITTEN signature store
    (operators/dedup.decide_batch_against_store — exact fingerprint
    tier, LSH-banded near tier, minhash verify), then the slice's KEPT
    documents' signatures are APPENDED to the store so the next shard
    sees them — the decide -> append -> repeat loop a 100 TB corpus
    runs continuously. foreachBatch is the honest vehicle: the LSH
    verify aggregate is not expressible as a stream-static equi-join,
    and production ingestion dedup runs exactly this pattern.

    The store starts as a COPY of the build over the existing side
    (base layout untouched — appends must never mutate the shared
    fingerprint-keyed cache), rooted in a per-run temp dir. The bounded
    file source delivers the table as one micro-batch, so the final
    decisions equal the batch operator's output (the stream==batch
    gate in tests/test_streaming_docs.py); the multi-shard semantics
    of the same loop — cross-shard duplicates caught via the store
    after the earlier shard's append — are pinned by the non-streaming
    loop test alongside it.
    """
    import shutil
    import tempfile

    from ..index.dedup_layout import (append_dedup_signatures,
                                      ensure_dedup_layout)
    from ..operators.dedup import BATCH_MOD, decide_batch_against_store

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    existing = docs.where(F.col("doc_id") % BATCH_MOD != 0)
    base = ensure_dedup_layout(spark, existing, sf_dir)
    run_root = tempfile.mkdtemp(prefix="stream_incdedup_")
    store = f"{run_root}/store"
    shutil.copytree(base, store)

    # driver-held slices keyed by micro-batch id: foreachBatch is
    # at-least-once (a failed batch is re-delivered with the SAME id),
    # so a retry overwrites its own slice instead of duplicating rows;
    # the store append below is idempotent per batch for the same
    # reason (append_dedup_signatures cleans its own append-id's
    # leftovers before re-appending)
    decided: dict[int, list] = {}

    def decide_slice(bdf: DataFrame, batch_id: int) -> None:
        batch = bdf.where(F.col("doc_id") % BATCH_MOD == 0)
        out = decide_batch_against_store(spark, batch, store)
        rows = out.collect()
        decided[batch_id] = rows
        kept = [(r["doc_id"],) for r in rows if r["decision"] == "kept"]
        if kept:
            # broadcast semi-join, not isin(): a realistic shard keeps
            # tens of thousands of ids — one literal each would bloat
            # the plan instead of hash-probing
            kept_df = spark.createDataFrame(kept, "doc_id long")
            append_dedup_signatures(
                spark, store,
                batch.join(F.broadcast(kept_df), "doc_id", "leftsemi"),
            )

    q = (
        read_documents_stream(spark, sf_dir)
        .writeStream.outputMode("append")
        .foreachBatch(decide_slice)
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(run_root, ignore_errors=True)
    all_rows = [r for _, rows in sorted(decided.items()) for r in rows]
    return spark.createDataFrame(
        all_rows, "doc_id long, decision string, n_near long"
    )
