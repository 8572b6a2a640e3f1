"""Index builder: Markdown corpus -> Parquet index tables (S3-S6 + build
pipeline of SURVEY.md §3.1).

The reference's build path (cli.index -> indexer.index_directories) is a
process pool per file plus ONE serial driver-process embedding call
(indexer.py:86-96); here the whole build is one lazy DataFrame chain —
 files -> chunks (mapInPandas) -> ids -> embeddings (pandas_udf, executor-
parallel) -> write — and the FTS tables derive from the chunk tokens with
explode + groupBy. Layout per SURVEY.md §4.3: narrow tables so a BM25
probe never reads content bytes and a kNN scan streams only vectors.

`--clear` semantics (reference db.py:199-206): overwrite mode replaces the
index atomically per table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TEST_EMBED_DIM
from ..models.embedder import embed_udf
from ..operators.chunker import chunk_documents, with_doc_ids
from ..sources.markdown import read_markdown_dirs

TABLES = ("documents", "embeddings", "postings", "docfreq", "docstats",
          "corpus_stats")


def build_fts_index_from_tokens(docs: DataFrame) -> dict[str, DataFrame]:
    """FTS tables from pre-tokenized chunks (tokens array column)."""
    docstats = docs.select("doc_id", F.size("tokens").alias("dl"))
    postings = (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus_stats = docstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    index = {"postings": postings, "docfreq": docfreq, "docstats": docstats,
             "corpus_stats": corpus_stats}
    # denormalized probe table (operators/bm25.scored_postings): written
    # alongside the normalized tables so a long-lived engine's BM25 branch
    # is a join-free scan too
    from ..operators.bm25 import scored_postings

    index["postings_scored"] = scored_postings(index)
    return index


def trim_prefix_expr(col, prefix: str | None):
    """T10 path trim as a pure SQL expression (reference indexer.py:112-136).

    Built entirely from the passed Column (no hardcoded column name), and
    the prefix is normpath'd to mirror the reference's normalize-both
    behavior; the path side is produced normalized by the markdown source.
    """
    if not prefix:
        return col
    norm = os.path.normpath(prefix)
    trimmed = F.regexp_replace(
        F.substring(col, len(norm) + 1, 2**31 - 1), "^/+", ""
    )
    return F.when(col.startswith(norm), trimmed).otherwise(col)


def index_directories(
    spark: SparkSession,
    dirs: list[str],
    out_dir: str,
    *,
    chunk_size: int = 512,
    chunk_overlap: int = 50,
    strategy: str = "header",
    tokenizer: str = "jp_heuristic",
    embed_backend: str = "hash",
    embedding_model: str = "hash-embedder",
    embed_dim: int = TEST_EMBED_DIM,
    remove_path_prefix: str | None = None,
) -> dict[str, int]:
    """Build all index tables under out_dir; returns row counts."""
    files = read_markdown_dirs(spark, dirs)
    chunks = with_doc_ids(
        chunk_documents(files, chunk_size, chunk_overlap, strategy, tokenizer)
    ).withColumn("file_path", trim_prefix_expr(F.col("file_path"),
                                               remove_path_prefix))

    # chunking runs once, feeds documents + embeddings + FTS derivations
    chunks = chunks.persist()
    docs = chunks.select(
        "doc_id", "file_path", "header_path", "line_start", "line_end",
        "content", "tokens",
    )
    emb = chunks.select(
        "doc_id",
        embed_udf(embed_backend, embedding_model, embed_dim)(
            F.col("content")
        ).alias("embedding"),
    )
    fts = build_fts_index_from_tokens(docs)

    counts: dict[str, int] = {}
    writes = {"documents": docs, "embeddings": emb, **fts}
    for name, df in writes.items():
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()

    meta = {
        "embedding_model": embedding_model,
        "embedding_backend": embed_backend,
        "embedding_dim": str(embed_dim),
        "tokenizer": tokenizer,
        "chunk_size": str(chunk_size),
        "chunk_overlap": str(chunk_overlap),
        "strategy": strategy,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    chunks.unpersist()
    return counts


def index_incremental(
    spark: SparkSession,
    dirs: list[str],
    out_dir: str,
    **kwargs,
) -> dict[str, int]:
    """Re-index only what changed. Deterministic chunk ids (sha2 over
    file/line/content — T9) turn incremental indexing into set algebra:
    chunks whose id already exists keep their stored EMBEDDING (the
    expensive stage); only genuinely new/changed chunks are embedded.
    Derived FTS tables are recomputed from the merged corpus (cheap
    relative to embedding; and df/avgdl are global, so they must be).

    Tables are written to a temp subdir then swapped in, so the build
    never overwrites parquet it is still lazily reading.

    Returns counts: added, kept, removed, plus per-table row counts.
    """
    import shutil

    meta = read_meta(out_dir)
    chunk_size = int(meta["chunk_size"])
    chunk_overlap = int(meta["chunk_overlap"])
    strategy = meta["strategy"]
    tokenizer = meta["tokenizer"]
    backend = meta["embedding_backend"]
    model = meta["embedding_model"]
    dim = int(meta["embedding_dim"])

    files = read_markdown_dirs(spark, dirs)
    chunks = with_doc_ids(
        chunk_documents(files, chunk_size, chunk_overlap, strategy, tokenizer)
    ).persist()

    old_docs = spark.read.parquet(os.path.join(out_dir, "documents"))
    old_emb = spark.read.parquet(os.path.join(out_dir, "embeddings"))

    ids = chunks.select("doc_id")
    kept_emb = old_emb.join(ids, "doc_id", "left_semi")
    new_chunks = chunks.join(old_docs.select("doc_id"), "doc_id", "left_anti")
    new_emb = new_chunks.select(
        "doc_id",
        embed_udf(backend, model, dim)(F.col("content")).alias("embedding"),
    )
    n_added = new_chunks.count()
    n_kept = kept_emb.count()
    n_removed = old_docs.join(ids, "doc_id", "left_anti").count()

    docs = chunks.select(
        "doc_id", "file_path", "header_path", "line_start", "line_end",
        "content", "tokens",
    )
    emb = kept_emb.unionByName(new_emb)
    fts = build_fts_index_from_tokens(docs)

    tmp = os.path.join(out_dir, "_incremental_tmp")
    counts: dict[str, int] = {
        "added": n_added, "kept": n_kept, "removed": n_removed
    }
    writes = {"documents": docs, "embeddings": emb, **fts}
    for name, df in writes.items():
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
    chunks.unpersist()
    for name in writes:
        final = os.path.join(out_dir, name)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(os.path.join(tmp, name), final)
        counts[name] = spark.read.parquet(final).count()
    shutil.rmtree(tmp, ignore_errors=True)
    return counts


def read_meta(index_dir: str) -> dict[str, str]:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def resolve_model(index_dir: str, requested: str | None) -> tuple[str, str, int]:
    """Stored-model-wins reconciliation (reference db.py:61-70): the model
    recorded at index time overrides a conflicting request, with a warning."""
    meta = read_meta(index_dir)
    stored = meta["embedding_model"]
    if requested and requested != stored:
        import warnings

        warnings.warn(
            f"index was built with embedding model {stored!r}; ignoring "
            f"requested {requested!r} (stored model wins)",
            stacklevel=2,
        )
    return stored, meta["embedding_backend"], int(meta["embedding_dim"])
