"""Scale-adaptive scan-parallelism helper.

A single-file parquet table arrives as ONE scan partition (one row
group), so every CPU-dense per-row expression chain over it (regex
gates, HOF filters, tokenization) runs single-threaded no matter how
many cores the session has — the r14 instrumented finding behind most
of the text family's wall time at test scale. At cluster scale the
input's file splits already provide scan parallelism and the extra
round-robin pass would be a full shuffle of the payload for nothing.

``spread`` repartitions ONLY when the input has fewer partitions than
the session's default parallelism: locally that restores all-core
execution; on a real corpus (thousands of splits) it is a no-op and no
shuffle is added. This replaces the older unconditional
``repartition(defaultParallelism)`` sites, which paid the shuffle at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the default parallelism iff it has
    fewer partitions than that — a no-op (and no added shuffle) once
    the source's own splits provide the parallelism. Streaming frames
    pass through untouched (no .rdd on a streaming plan; micro-batch
    parallelism is the source's concern)."""
    if df.isStreaming:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
