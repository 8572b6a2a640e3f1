"""Whitened embedding dedup + the covariance statistic: the anisotropy
story (why whitening exists), numpy cross-checks, and edge behavior.
Oracle parity is covered by tests/test_oracle_parity.py like every
registered query."""

from __future__ import annotations

import numpy as np

from duckdb_hybrid_doc_search_spark.operators import analytics, dedup


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_covariance_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {(r.i, r.j): r.cov
           for r in analytics.embeddings_covariance(emb).collect()}
    X = np.array([r.embedding for r in emb.orderBy("vec_id").collect()],
                 dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)  # population, like the op
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - round(C[i, j], 6)) <= 1e-6, (i, j, v, C[i, j])


def test_whitening_standardizes_each_dimension(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    z = np.array([r.embedding for r in
                  dedup.whiten_embeddings(emb).collect()], dtype=np.float64)
    assert np.abs(z.mean(axis=0)).max() < 1e-3
    assert np.abs(z.std(axis=0) - 1.0).max() < 1e-3


def test_whitening_defeats_anisotropy(spark):
    """The reason the operator exists: add a large COMMON direction to
    every vector (the anisotropy real text embeddings exhibit) and raw
    cosine saturates — almost every pair clears the threshold, so raw
    dedup would delete the corpus. Whitened dedup removes the common
    direction and recovers (a superset-free approximation of) the
    original pair structure."""
    rng = np.random.default_rng(3)
    n, d = 300, 64  # d=64: the threshold's 3.2-sigma design point
    X = rng.normal(size=(n, d))
    bias = np.zeros(d)
    bias[0] = 25.0  # dominant shared direction
    Xa = X + bias

    raw_pairs = dedup._embedding_pairs_gemm(
        _emb_df(spark, Xa), 8, dedup.WHITEN_DUP_THRESHOLD).count()
    white_pairs = dedup.dedup_embedding_whitened(
        _emb_df(spark, Xa)).count()
    total = n * (n - 1) // 2
    assert raw_pairs > 0.9 * total, (raw_pairs, total)  # saturated
    assert white_pairs < 0.01 * total, (white_pairs, total)


def test_whitened_is_raw_on_already_standard_data(spark):
    """On data that is already standardized (zero mean, unit variance
    per dimension), whitening is a near-identity and the whitened pair
    set equals the raw GEMM's at the same threshold."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 16))
    X = (X - X.mean(axis=0)) / X.std(axis=0)
    df = _emb_df(spark, X)
    raw = {(r.vec_a, r.vec_b) for r in dedup._embedding_pairs_gemm(
        df, 8, dedup.WHITEN_DUP_THRESHOLD).collect()}
    white = {(r.vec_a, r.vec_b)
             for r in dedup.dedup_embedding_whitened(df).collect()}
    assert white == raw and raw  # non-empty at 3.2 sigma over 19900 pairs


def test_whitening_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.dedup_embedding_whitened(empty).count() == 0
    assert analytics.embeddings_covariance(empty).count() == 0


def test_whiten_stats_partials_equal_expressions(spark, sf_dir):
    """r13 VERDICT What's-wrong #4: the Arrow-partials moment pass (D
    rows per partition) must be VALUE-IDENTICAL to the original
    2·D-codegen-column aggregate after the shared SCORE_ROUND rounding
    — same mu, same sd, dimension for dimension."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mu_p, sd_p = dedup.whiten_stats(emb, strategy="partials")
    mu_e, sd_e = dedup.whiten_stats(emb, strategy="expressions")
    assert mu_p == mu_e
    assert sd_p == sd_e


def test_whiten_stats_partials_equal_expressions_edge_dims(spark):
    """Zero-variance and negative-mean dimensions through both moment
    strategies, plus the unknown-strategy guard."""
    import pytest as _pytest

    X = np.array([
        [1.0, -2.0, 5.0],
        [1.0, -4.0, 5.0],
        [1.0, -6.0, 5.0],
        [1.0, -8.0, 5.0],
    ])
    df = _emb_df(spark, X)
    mu_p, sd_p = dedup.whiten_stats(df, strategy="partials")
    mu_e, sd_e = dedup.whiten_stats(df, strategy="expressions")
    assert mu_p == mu_e == [1.0, -5.0, 5.0]
    assert sd_p == sd_e
    assert sd_p[0] == 1.0 and sd_p[2] == 1.0  # zero-variance -> sd 1
    with _pytest.raises(ValueError, match="strategy"):
        dedup.whiten_stats(df, strategy="bogus")
