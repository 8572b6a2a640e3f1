"""JSONL document source — the de-facto interchange format for LLM
training corpora (one JSON object per line, nested metadata).

Spark's json source splits by line and infers/accepts a schema, so a
100 TB JSONL corpus parallelizes by input split exactly like parquet; the
explicit schema below avoids the inference scan (a full extra pass at
scale) and pins types for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("lang", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """(id, text, meta struct, score) — schema-pinned, no inference pass."""
    return spark.read.schema(JSONL_SCHEMA).json(path)
