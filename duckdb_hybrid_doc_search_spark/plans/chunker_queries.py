"""Chunker-related query registrations.

T1 (front-matter strip) is a pure regex expression — oracle-gated by
synthesizing front matter onto the documents table so the regex actually
fires. The full Markdown chunker is not SQL-expressible (stateful
fence/header walk) -> registered rows-only over the bundled fixture corpus;
its semantics are unit-tested in tests/test_chunker.py.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import dd_strip_front_matter, strip_front_matter
from ..index.catalog import load_table
from ..operators.chunker import chunk_documents, with_doc_ids
from ..sources.markdown import read_markdown_dirs
from .registry import register

FIXTURES_DIR = str(
    pathlib.Path(__file__).resolve().parent.parent.parent / "fixtures" / "docs"
)

_SYNTH = "'---\nsource: ' || source || '\n---\n' || text"


@register(
    "front_matter_strip",
    oracle=f"""
SELECT doc_id, {dd_strip_front_matter(_SYNTH)} AS clean_text
FROM documents
""".strip(),
)
def front_matter_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("---\nsource: "), F.col("source"), F.lit("\n---\n"),
        F.col("text"),
    )
    return docs.select(
        "doc_id", strip_front_matter(synth).alias("clean_text")
    )


from .chunker_oracle import fixtures_oracle_sql  # noqa: E402


@register("markdown_chunk_fixtures", oracle=fixtures_oracle_sql(FIXTURES_DIR))
def markdown_chunk_fixtures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the bundled fixture corpus end-to-end. The oracle is a VALUES
    literal produced by an INDEPENDENT pure-Python re-derivation of the
    chunking spec (plans/chunker_oracle.py) — a real cross-engine check on
    chunk boundaries, header paths, line spans, and deterministic ids."""
    files = read_markdown_dirs(spark, [FIXTURES_DIR])
    return with_doc_ids(chunk_documents(files)).select(
        "doc_id", "file_path", "header_path", "line_start", "line_end",
        "content",
    )
