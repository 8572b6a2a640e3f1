"""Multi-format source/sink coverage: the index tables round-trip through
every columnar/text format this Spark build ships (parquet is the primary
layout; ORC/CSV/JSON prove the source/sink surface is format-agnostic).

Avro requires the external spark-avro module (not bundled in this
container) — asserted absent so a future environment change surfaces it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table


def _docs(spark, sf_dir):
    # narrow projection so CSV (no nested/array support) round-trips too
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_roundtrip_format(spark, sf_dir, tmp_path, fmt):
    src = _docs(spark, sf_dir)
    out = str(tmp_path / fmt)
    w = src.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(out)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
    if fmt in ("csv", "json"):
        # schema-on-read: skip inference (an extra full pass at scale) and
        # pin column order, which json inference alphabetizes
        r = r.schema(src.schema)
    back = r.load(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orc_pushes_filters(spark, sf_dir, tmp_path):
    """Pushdown works through the ORC scan exactly like parquet."""
    src = _docs(spark, sf_dir)
    out = str(tmp_path / "orc_pd")
    src.write.format("orc").mode("overwrite").save(out)
    df = spark.read.orc(out).where(F.col("lang") == "en").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def test_avro_not_bundled_documented():
    """spark-avro is an external module; if this ever starts passing,
    wire an avro roundtrip above."""
    from duckdb_hybrid_doc_search_spark.session import get_spark  # noqa: F401
    import pyspark

    jars = __import__("pathlib").Path(pyspark.__file__).parent / "jars"
    assert not list(jars.glob("spark-avro*.jar"))


def test_orc_docs_cache_and_gc(spark, sf_dir, tmp_path):
    """ensure_orc_documents writes once per source generation, reuses the
    cached copy, and GCs only older generations of the SAME corpus stem
    (a corpus whose name extends the stem survives)."""
    import os

    from duckdb_hybrid_doc_search_spark.sources.orcsrc import (
        _ORC_VERSION, ensure_orc_documents,
    )

    root = str(tmp_path / "orc_root")
    p1 = ensure_orc_documents(spark, sf_dir, root=root)
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
    assert ensure_orc_documents(spark, sf_dir, root=root) == p1
    assert os.path.getmtime(os.path.join(p1, "_SUCCESS")) == mtime  # reused

    stem = os.path.basename(os.path.normpath(sf_dir)) + "-documents"
    stale = os.path.join(root, f"{stem}-v{_ORC_VERSION}-0-0")
    unrelated = os.path.join(root, f"{stem}2-v{_ORC_VERSION}-0-0")
    os.makedirs(stale); os.makedirs(unrelated)
    # force a rebuild by removing the success marker
    os.remove(os.path.join(p1, "_SUCCESS"))
    ensure_orc_documents(spark, sf_dir, root=root)
    assert not os.path.exists(stale)       # same-corpus older gen collected
    assert os.path.exists(unrelated)       # name-extending corpus survives
