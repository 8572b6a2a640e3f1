"""Streaming search-index maintenance: keep the written index fresh as
new Markdown lands.

The reference re-runs its whole indexer by hand when docs change
(ref indexer.py:31-96); here a Structured Streaming file source WATCHES
the docs directories and each micro-batch re-converges the index through
``index/builder.index_incremental`` — the deterministic-chunk-id set
algebra means only genuinely new/changed chunks pay the embedding stage,
kept embeddings stay byte-identical, and the derived FTS tables are
recomputed from the merged corpus (df/avgdl are global, so they must be).

The stream carries file CONTENT only to detect work (names + sizes would
miss in-place edits at equal length); the heavy lifting always runs
through the same batch code path, so stream-vs-batch equivalence is by
construction, with the swap-in write keeping probes consistent mid-update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_markdown_stream(spark: SparkSession, dirs: list[str]) -> DataFrame:
    """Bounded file stream over ``*.md`` under the watched dirs (wholetext,
    recursive) — the streaming twin of sources/markdown.py."""
    if len(dirs) != 1:
        # one stream per root keeps source bookkeeping simple; callers
        # union streams if they truly watch disjoint roots
        raise ValueError("watch exactly one root dir per stream")
    return (
        spark.readStream
        .format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.md")
        .option("recursiveFileLookup", "true")
        .load(dirs[0])
    )


def run_streaming_index_update(spark: SparkSession, watch_dir: str,
                               out_dir: str, checkpoint: str):
    """Start a stream that re-converges the index whenever files arrive.

    Every micro-batch triggers one ``index_incremental`` pass over the
    watched dir: chunks whose deterministic id already exists keep their
    stored embedding; new/changed chunks embed; removed files drop out.
    Returns the StreamingQuery (caller owns lifecycle; tests drive it
    with processAllAvailable).
    """
    from ..index.builder import index_incremental

    stream = read_markdown_stream(spark, [watch_dir])

    def reconverge(batch_df: DataFrame, batch_id: int) -> None:
        # the batch content is the change SIGNAL; reconvergence always
        # reads the authoritative dir state through the batch path, so a
        # lost/duplicated micro-batch cannot corrupt the index (idempotent)
        if batch_df.isEmpty():
            return
        index_incremental(spark, [watch_dir], out_dir)

    return (
        stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch(reconverge)
        .start()
    )
