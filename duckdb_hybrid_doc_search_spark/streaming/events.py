"""Structured Streaming form of the event operators.

The reference has no streaming surface (its MCP server is request/response,
server.py:70-95); this module is part of the pipeline north-star: the same
windowed aggregation, expressed as a streaming query with watermarked event
time, so late data is handled and state is bounded. Tests drive it with the
parquet events table as a bounded stream (memory sink +
processAllAvailable) and assert equality with the batch form in
operators/events.py — batch is the specification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import VALUE_ROUND, WINDOW_SECONDS

WATERMARK = "1 day"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file stream over the events parquet (one file = one batch).

    In production this is a Kafka/queue source with the same schema; the
    transformation below is source-agnostic.
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source requires a directory; glob-filter to the one
    # table inside the scale-factor dir
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def streaming_windowed_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-day window per event_type with a 1-day watermark.

    Emits window_start as epoch seconds to match the batch/oracle form.
    """
    with_ts = events.withColumn(
        "tse", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_ts.withWatermark("tse", WATERMARK)
        .groupBy(
            F.window("tse", f"{WINDOW_SECONDS} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
        )
        .select(
            (F.unix_micros("w.start") / F.lit(1_000_000))
            .cast("long")
            .alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_streaming_windowed_agg(spark: SparkSession, sf_dir: str,
                               query_name: str = "ev_win") -> DataFrame:
    """Drive the stream to completion on the bounded source and return the
    final result as a DataFrame (complete output mode -> memory sink)."""
    stream = streaming_windowed_agg(read_events_stream(spark, sf_dir))
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
