"""Shared scaffolding for the bounded foreachBatch drives (the FTS /
IVF maintenance loops and the composed ingestion pipeline): run-dir
ownership, the N-file spool source that forces multiple micro-batches,
and the start → processAllAvailable → result → cleanup envelope. One
definition so a fix to the envelope (double-stop, spool mode, root
ownership) cannot drift between the loops."""

from __future__ import annotations

import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def own_run_root(run_root: str | None, prefix: str) -> tuple[str, bool]:
    """(run_root, caller_owns): mkdtemp when the caller didn't supply a
    dir; a caller-supplied dir is left on disk for post-run inspection."""
    if run_root is not None:
        return run_root, True
    return tempfile.mkdtemp(prefix=prefix), False


def bounded_file_source(spark: SparkSession, frame: DataFrame,
                        spool_dir: str, trigger_files: int | None,
                        whole_source: Callable[[], DataFrame]) -> DataFrame:
    """The drive's stream source: either the caller's whole-table
    bounded source (one micro-batch), or — when ``trigger_files`` is
    set — the arriving frame spooled as N parquet files and streamed
    with maxFilesPerTrigger=1, forcing N micro-batches so cadence
    logic (folds, cross-shard dedup) actually fires under test."""
    if trigger_files:
        frame.repartition(trigger_files).write.parquet(spool_dir)
        return (
            spark.readStream.schema(frame.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(spool_dir)
        )
    return whole_source()


def drive_bounded(source: DataFrame, body, query_name: str,
                  result_fn: Callable[[], DataFrame],
                  run_root: str, caller_owns_root: bool) -> DataFrame:
    """start → processAllAvailable → stop → result (pinned off the run
    dir via localCheckpoint) → cleanup-unless-caller-owned."""
    q = (
        source
        .writeStream.outputMode("append")
        .foreachBatch(body)
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
        q.stop()
        result = result_fn().localCheckpoint()
    finally:
        q.stop()
        if not caller_owns_root:
            shutil.rmtree(run_root, ignore_errors=True)
    return result
