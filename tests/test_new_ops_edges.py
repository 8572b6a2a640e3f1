"""Edge behavior of the round-5 operators: empty inputs must produce
empty (or structurally-zero) results, never exceptions, and the
non-empty invariants the oracles can't see (bounds, partition totals)
hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.operators import analytics, curation, knn


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long"
    )


def _empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    )


def test_benchmark_contamination_empty_and_bounds(spark, sf_dir):
    assert curation.benchmark_contamination(_empty_docs(spark)).count() == 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curation.benchmark_contamination(docs).collect()
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_train"]
        assert 0.0 <= r["contamination_rate"] <= 1.0
        assert (r["max_overlap"] > 0) == (r["n_contaminated"] > 0)


def test_matryoshka_recall_empty_and_bounds(spark, sf_dir):
    assert knn.matryoshka_recall(_empty_emb(spark), 10, 10).count() == 0
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = knn.matryoshka_recall(emb, 10, 10).collect()
    assert len(rows) == 10
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in rows)
    # full-width "truncation" is the identity: recall exactly 1.0
    full = knn.matryoshka_recall(emb, 10, 5, dim=64).collect()
    assert all(r["recall_at_k"] == 1.0 for r in full)


def test_knn_classify_empty_and_partition(spark, sf_dir):
    assert knn.knn_classify_accuracy(_empty_emb(spark), 5, 50).count() == 0
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = knn.knn_classify_accuracy(emb, knn.CLS_K, 50).collect()
    # every query classified exactly once: per-label n sums to the
    # query-set size
    assert sum(r["n"] for r in rows) == emb.where(F.col("vec_id") < 50).count()
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in rows)


def test_retention_triangle_empty_and_invariants(spark, sf_dir):
    assert analytics.retention_triangle(_empty_events(spark)).count() == 0
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = analytics.retention_triangle(ev).collect()
    assert rows, "purchases exist at every sf"
    for r in rows:
        assert r["day_offset"] >= 0
        assert r["n_active"] <= r["cohort_size"]
        assert 0.0 < r["retention"] <= 1.0
    # day-0 cell is the cohort itself
    assert all(r["retention"] == 1.0 for r in rows if r["day_offset"] == 0)


def test_nprobe_curve_monotone(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = {r["nprobe"]: r for r in knn.ivf_nprobe_curve(emb, 10, 10).collect()}
    assert sorted(rows) == sorted(knn.NPROBE_SWEEP)
    sweep = sorted(rows)
    # more probes never hurt recall and always scan at least as much
    for a, b in zip(sweep, sweep[1:]):
        assert rows[b]["mean_recall"] >= rows[a]["mean_recall"]
        assert rows[b]["mean_candidates"] >= rows[a]["mean_candidates"]
