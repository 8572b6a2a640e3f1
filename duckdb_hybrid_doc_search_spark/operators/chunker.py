"""Distributed Markdown chunking (T1-T7, T9 of SURVEY.md §2.2).

One `mapInPandas` pass turns whole-file rows into chunk rows: the pure
chunker (chunker_core.py) runs per file inside Arrow batches — documents
are embarrassingly parallel, so the operator scales with input splits, and
the Python boundary is crossed once per batch, not per row or per chunk.

doc_id is deterministic (sha2 over file_path, line_start and content) —
unlike the reference's random ULIDs (indexer.py:107) a re-index of the same
corpus produces the same ids, which makes incremental/idempotent pipelines
possible at scale (SURVEY.md T9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..models.tokenizer import tokenize_query
from .chunker_core import (DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE,
                           split_markdown)

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("header_path", T.StringType(), True),
        T.StructField("line_start", T.IntegerType(), False),
        T.StructField("line_end", T.IntegerType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ]
)


def chunk_documents(files: DataFrame,
                    chunk_size: int = DEFAULT_CHUNK_SIZE,
                    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
                    strategy: str = "header",
                    tokenizer: str = "jp_heuristic") -> DataFrame:
    """files(file_path, content) -> chunk rows with tokens (T7 applied with
    the SAME tokenizer the query side will use — identity contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for file_path, content in zip(pdf["file_path"], pdf["content"]):
                for c in split_markdown(
                    file_path, content, chunk_size, chunk_overlap, strategy
                ):
                    rows.append(
                        (
                            c.file_path,
                            c.header_path,
                            c.line_start,
                            c.line_end,
                            c.content,
                            tokenize_query(c.content, backend=tokenizer),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in CHUNK_SCHEMA.fields]
            )

    return files.mapInPandas(run, CHUNK_SCHEMA)


def with_doc_ids(chunks: DataFrame) -> DataFrame:
    """T9: deterministic chunk ids."""
    return chunks.withColumn(
        "doc_id",
        F.sha2(
            F.concat_ws(
                "\x1f", "file_path", F.col("line_start").cast("string"),
                "content"
            ),
            256,
        ),
    )
