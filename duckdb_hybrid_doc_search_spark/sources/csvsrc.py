"""CSV document source — the other ubiquitous corpus interchange format.

Schema-pinned like sources/jsonl.py (no inference pass — at 100 TB schema
inference is a full extra scan). Standard RFC-4180 quoting (embedded
commas + doubled quotes) parses splittably; `multiLine` stays OFF because
records containing raw newlines make the file unsplittable — one task per
file — which is the wrong trade at scale. Corpora with embedded newlines
should be converted to JSONL/parquet at ingest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def read_csv_docs(spark: SparkSession, path: str) -> DataFrame:
    """(id, text, lang, source, score) with RFC-4180 quote handling."""
    return (
        spark.read.schema(CSV_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')  # RFC-4180 doubled-quote escaping
        .csv(path)
    )
