"""SparkSession factory tuned for this engine.

Local-mode settings mirror what the production deployment would set cluster-wide:
AQE on (runtime re-plan, skew-join splitting), Arrow on (every pandas_udf
crossing is batched), shuffle partitions sized to cores instead of the 200
default, UTC session timezone so timestamp results are comparable with the
DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "hybrid-doc-search", cpus: int | None = None) -> SparkSession:
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # one shuffle partition per core: local mode has no network shuffle,
        # 200 partitions on 60k rows is pure overhead, and at cluster scale
        # this knob is set to ~2-3x total cores by the deployment config.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing keeps parallelismFirst (default), but its 1 MB
        # minPartitionSize floor collapses small-byte CPU-DENSE shuffles
        # (pair-cosine joins, per-group Arrow GEMM blocks, per-doc
        # windows) to ~1 partition — measured single-task post-shuffle
        # stages across the dedup/ANN families at sf0.1 (r14). A 64 KB
        # floor lets AQE keep ~defaultParallelism partitions for those
        # stages; at cluster scale partitions are far above 1 MB and the
        # floor is inert, so this is scale-adaptive, not a local tune.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # broadcast anything under 32 MB: query-term lists, candidate-id sets,
        # docfreq slices and dimension tables are all provably tiny.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # the events table carries nanosecond timestamps, which Spark's
        # parquet reader rejects by default; read them as (nanos) longs and
        # convert explicitly (operators/events.py works in epoch micros).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # static conf, default 100: with 170+ distinct registered plan
        # shapes the compiled-class cache thrashes and EVERY execution
        # pays a fresh janino compile late in a bench/verify session.
        # Measured at sf0.1, same machine, back-to-back full sweeps:
        # default 100 -> tpch_q10 1.51s, redact_pii 0.84s, as-of 0.56s,
        # dedup_components 6.71s; maxEntries 1000 -> 0.51 / 0.32 / 0.25
        # / 2.58s (fresh-session standalone numbers, confirming the
        # inflation was recompiles, not the queries).
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # UI off for tests (port churn); bench.py turns it on to read
        # per-query shuffle/input bytes from the status REST API
        .config("spark.ui.enabled",
                os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
