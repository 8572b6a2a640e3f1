"""Python UDTF surface: the LATERAL sentence UDTF must equal the
vectorized posexplode form (which is what the hot path should use)."""

from __future__ import annotations

from duckdb_hybrid_doc_search_spark.operators import udtfs


def test_udtf_equals_vectorized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = udtfs.sentence_split_udtf(docs).collect()
    b = udtfs.sentence_split_sql(docs).collect()
    assert a == b and len(a) > 0


def test_udtf_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "One. Two! Three?"),
            (2, "...!!!"),            # only punctuation -> zero sentences
            (3, "  padded .  also padded  "),
            (4, None),                # NULL text -> zero sentences
            (5, "no terminal punctuation"),
        ],
        "doc_id long, text string",
    )
    rows = udtfs.sentence_split_udtf(docs).collect()
    got = {(r["doc_id"], r["sentence_no"]): r["sentence"] for r in rows}
    assert got == {
        (1, 1): "One", (1, 2): "Two", (1, 3): "Three",
        (3, 1): "padded", (3, 2): "also padded",
        (5, 1): "no terminal punctuation",
    }
    assert udtfs.sentence_split_sql(docs).collect() == rows
