"""Invariant tests for the statistical/temporal analytics family
(operators/analytics.py) — parity with DuckDB is covered by
test_oracle_parity; these pin the semantic contracts."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from duckdb_hybrid_doc_search_spark.operators import analytics


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_twap_bounded_by_value_range(spark, sf_dir, events):
    """A time-weighted average is a convex combination of the user's
    observed values, so it must sit inside [min, max] of those values."""
    twap = analytics.events_user_twap(events)
    rng = events.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        twap.join(rng, "user_id")
        .where(
            F.col("twap").isNotNull()
            & (
                (F.col("twap") < F.col("lo") - 1e-6)
                | (F.col("twap") > F.col("hi") + 1e-6)
            )
        )
        .count()
    )
    assert bad == 0


def test_twap_null_only_for_single_event_users(events):
    twap = analytics.events_user_twap(events)
    nulls = twap.where(F.col("twap").isNull())
    assert nulls.where(F.col("n_events") > 1).count() == 0


def test_scd2_intervals_tile_without_overlap(spark, sf_dir):
    """Per customer: exactly one open interval, and each close equals the
    next open (intervals tile the customer's history)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    scd = analytics.orders_scd2_intervals(orders).cache()
    try:
        opens = scd.where(F.col("is_current")).groupBy("o_custkey").count()
        assert opens.where(F.col("count") != 1).count() == 0
        assert scd.count() == orders.count()
        # valid_to (when set) must be >= valid_from and equal to some
        # sibling's valid_from
        assert (
            scd.where(
                F.col("valid_to").isNotNull()
                & (F.col("valid_to") < F.col("valid_from"))
            ).count()
            == 0
        )
    finally:
        scd.unpersist()


def test_kmeans_step_partitions_all_vectors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = analytics.embeddings_kmeans_step(emb).collect()
    assert sum(r["n"] for r in out) == emb.count()
    assert all(r["mean_d2"] >= 0.0 for r in out)
    assert len(out) <= analytics.KMEANS_K


def test_kl_divergence_nonnegative(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = analytics.corpus_kl_source_lang(docs).collect()
    assert len(out) > 0
    # Gibbs' inequality: KL >= 0 (tolerance for the 6-decimal rounding)
    assert all(r["kl_vs_corpus"] >= -1e-6 for r in out)


def test_moments_match_scipy_style_corrections(spark, lineitem):
    """The published G1/G2 equal the textbook bias-corrected statistics
    computed driver-side from raw moments on a sample slice."""
    import math

    rows = lineitem.where(F.col("l_returnflag") == "A").select(
        "l_extendedprice"
    )
    xs = [r[0] for r in rows.collect()]
    n = len(xs)
    mean = sum(xs) / n
    m2 = sum((x - mean) ** 2 for x in xs) / n
    m3 = sum((x - mean) ** 3 for x in xs) / n
    m4 = sum((x - mean) ** 4 for x in xs) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3.0
    big_g1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    big_g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
    got = {
        r["l_returnflag"]: r
        for r in analytics.lineitem_stats_moments(lineitem).collect()
    }["A"]
    assert got["skew_price"] == pytest.approx(big_g1, abs=1e-3)
    assert got["kurt_price"] == pytest.approx(big_g2, abs=1e-3)


def test_trend_slope_sign_matches_manual_fit(spark, events):
    """regr_slope agrees with a driver-side least-squares fit per type."""
    out = {
        r["event_type"]: r["slope"]
        for r in analytics.events_value_trend(events).collect()
    }
    one = events.where(F.col("event_type") == "click").select(
        (analytics.ts_micros(events) / F.lit(86_400_000_000.0)).alias("x"),
        F.col("value").alias("y"),
    )
    pts = [(r["x"], r["y"]) for r in one.collect()]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["click"] == pytest.approx(slope, rel=1e-3, abs=1e-6)


def test_chi_square_contributions_nonnegative_and_counts_total(
    spark, sf_dir, events
):
    out = analytics.events_chi_square(events).collect()
    assert sum(r["n_events"] for r in out) == events.count()
    assert all(r["chi2_contrib"] >= 0.0 for r in out)


def test_rolling_actives_dominate_daily(spark, sf_dir, events):
    """Trailing-7d distinct actives >= same-day distinct actives, and the
    day-1 value equals the daily count (no history before the window)."""
    rows = analytics.events_rolling_active_users(events).collect()
    assert rows, "no days observed"
    assert all(r["n_active_7d"] >= r["n_active_1d"] for r in rows)
    first = min(rows, key=lambda r: r["day"])
    assert first["n_active_7d"] == first["n_active_1d"]


def test_cohort_ltv_cumulative_monotone_and_age0_cohort_size(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = analytics.orders_cohort_ltv(orders).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_m"], []).append(r)
    n_custs = orders.select("o_custkey").distinct().count()
    age0_customers = 0
    for cohort, cells in by_cohort.items():
        cells.sort(key=lambda r: r["age"])
        assert cells[0]["age"] == 0  # a cohort exists because of its first order
        age0_customers += cells[0]["n_customers"]
        cums = [c["cum_revenue"] for c in cells]
        assert all(b >= a - 1e-6 for a, b in zip(cums, cums[1:]))
    # every customer appears in exactly one cohort's age-0 cell
    assert age0_customers == n_custs


def test_kmeans_train_inertia_nonincreasing(spark, sf_dir):
    """Lloyd's total inertia (sum n*mean_d2) must not increase across
    iterations, and every iteration partitions all vectors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = analytics.embeddings_kmeans_train(emb).collect()
    total = emb.count()
    by_iter = {}
    for r in rows:
        by_iter.setdefault(r["iteration"], []).append(r)
    assert sorted(by_iter) == list(range(analytics.KMEANS_ITERS))
    inertias = []
    for it in sorted(by_iter):
        cells = by_iter[it]
        assert sum(c["n"] for c in cells) == total
        inertias.append(sum(c["n"] * c["mean_d2"] for c in cells))
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a * (1 + 1e-9)


def test_hll_union_matches_exact_within_tolerance(spark, sf_dir):
    """Sketch-merge property: the unioned per-type sketches estimate the
    corpus-wide distinct within HLL tolerance (lgK default 12 -> ~1.6%
    at 3 sigma), and per-type estimates match their own exact counts."""
    from duckdb_hybrid_doc_search_spark.operators import analytics

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r["event_type"]: r for r in
            analytics.events_hll_union_types(ev).collect()}
    assert "__merged__" in rows
    for r in rows.values():
        assert r["rel_err"] <= 0.05
    merged = rows.pop("__merged__")
    assert merged["exact"] >= max(r["exact"] for r in rows.values())


def test_pca_power_converges(spark, sf_dir):
    """Power iteration: deterministic, eigenvalue estimates monotonically
    non-decreasing, successive-direction cosine approaching 1."""
    from duckdb_hybrid_doc_search_spark.operators import analytics

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = analytics.embeddings_pca_power(emb).collect()
    assert [r["iteration"] for r in rows] == list(
        range(analytics.PCA_ITERS)
    )
    eig = [r["eigenvalue"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(eig, eig[1:]))
    assert rows[-1]["cos_prev"] > 0.9
    assert analytics.embeddings_pca_power(emb).collect() == rows
