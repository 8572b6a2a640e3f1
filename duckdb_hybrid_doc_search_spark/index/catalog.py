"""Table catalog over a scale-factor directory of parquet tables.

The driver test data (TESTDATA.md) is one parquet file per table; the engine
reads them with explicit column pruning left to Catalyst. At production
scale these would be partitioned/bucketed table roots — the API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_conf(spark: SparkSession) -> None:
    """Settings the engine's results depend on, applied defensively: the
    harness may hand us a session built elsewhere (get_spark sets these at
    build time, but a foreign session won't have them).

    - nanosAsLong: Spark otherwise refuses the nanosecond-timestamp events
      parquet outright;
    - UTC session timezone: epoch extraction from TIMESTAMP_NTZ columns
      interprets wall time in the session zone — any other zone shifts
      results vs the (UTC-naive) DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
