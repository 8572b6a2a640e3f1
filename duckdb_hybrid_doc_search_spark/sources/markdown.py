"""Markdown corpus source (S1/S2 in SURVEY.md §2.1).

Replaces the reference's os.walk + per-process file reads
(splitter.py:394-399, :59-60) with Spark's distributed file source:
recursive lookup + glob filter push the directory scan into the data
source, `wholetext` gives one row per file, and task scheduling replaces
the ProcessPoolExecutor fan-out (T11) outright — file parallelism is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_markdown_dirs(spark: SparkSession, dirs: list[str],
                       glob: str = "*.md") -> DataFrame:
    """(file_path, content) — one row per Markdown file under any of dirs."""
    dfs = []
    for d in dirs:
        dfs.append(
            spark.read.option("recursiveFileLookup", "true")
            .option("pathGlobFilter", glob)
            .text(d, wholetext=True)
            .select(
                F.regexp_replace(
                    F.input_file_name(), "^file:/{0,2}(/)", "$1"
                ).alias("file_path"),
                F.col("value").alias("content"),
            )
        )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
