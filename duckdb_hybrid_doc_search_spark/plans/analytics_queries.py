"""Registrations for the statistical/temporal analytics family
(operators/analytics.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.catalog import load_table
from ..operators import analytics
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register("events_value_trend", oracle=analytics.dd_events_value_trend_sql())
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_value_trend(_t(spark, sf_dir, "events"))


@register("events_user_twap", oracle=analytics.dd_events_user_twap_sql())
def events_user_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_user_twap(_t(spark, sf_dir, "events"))


@register(
    "lineitem_stats_moments",
    oracle=analytics.dd_lineitem_stats_moments_sql(),
)
def lineitem_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.lineitem_stats_moments(_t(spark, sf_dir, "lineitem"))


@register(
    "orders_scd2_intervals", oracle=analytics.dd_orders_scd2_intervals_sql()
)
def orders_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.orders_scd2_intervals(_t(spark, sf_dir, "orders"))


@register(
    "embeddings_kmeans_step",
    oracle=analytics.dd_embeddings_kmeans_step_sql(),
)
def embeddings_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.embeddings_kmeans_step(_t(spark, sf_dir, "embeddings"))


@register(
    "corpus_kl_source_lang", oracle=analytics.dd_corpus_kl_source_lang_sql()
)
def corpus_kl_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.corpus_kl_source_lang(_t(spark, sf_dir, "documents"))


@register("events_chi_square", oracle=analytics.dd_events_chi_square_sql())
def events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_chi_square(_t(spark, sf_dir, "events"))


@register(
    "events_rolling_active_users",
    oracle=analytics.dd_events_rolling_active_users_sql(),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_rolling_active_users(_t(spark, sf_dir, "events"))


@register(
    "orders_window_showcase",
    oracle=analytics.dd_orders_window_showcase_sql(),
)
def orders_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.orders_window_showcase(_t(spark, sf_dir, "orders"))


@register("orders_cohort_ltv", oracle=analytics.dd_orders_cohort_ltv_sql())
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.orders_cohort_ltv(_t(spark, sf_dir, "orders"))


@register("orders_yoy_growth", oracle=analytics.dd_orders_yoy_growth_sql())
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.orders_yoy_growth(_t(spark, sf_dir, "orders"))


@register("embeddings_kmeans_train", oracle=None, bench=True)
def embeddings_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means (rows-only: float iteration); per-
    iteration cluster stats with inertia-monotonicity pinned in tests."""
    return analytics.embeddings_kmeans_train(_t(spark, sf_dir, "embeddings"))


@register("events_user_decay_avg",
          oracle=analytics.dd_events_user_decay_avg_sql())
def events_user_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_user_decay_avg(_t(spark, sf_dir, "events"))


@register("events_hll_union_types", oracle=None)
def events_hll_union_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches per event type + union-merge, error vs
    exact recorded (rows-only: sketch internals aren't SQL)."""
    return analytics.events_hll_union_types(_t(spark, sf_dir, "events"))


@register("events_range_frame_sum",
          oracle=analytics.dd_events_range_frame_sum_sql())
def events_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_range_frame_sum(_t(spark, sf_dir, "events"))


@register("events_data_quality",
          oracle=analytics.dd_events_data_quality_sql())
def events_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_data_quality(_t(spark, sf_dir, "events"))


@register("embeddings_pca_power", oracle=None)
def embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction by power iteration (one Arrow-GEMM
    partial-sum pass per step, covariance never materialized); rows-only
    — iterative float fixpoint with convergence trace recorded."""
    return analytics.embeddings_pca_power(_t(spark, sf_dir, "embeddings"))


@register("embeddings_covariance",
          oracle=analytics.dd_embeddings_covariance_sql())
def embeddings_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle population covariance of the embedding matrix in
    ONE corpus pass (per-partition Arrow GEMM partials + a map-side-
    combined groupBy; shuffle volume D(D+1)/2 rows per partition,
    independent of N) — the whitening/PCA preprocessing statistic
    semantic-curation pipelines need, and the ORACLED anchor the
    rows-only embeddings_pca_power sits on: the covariance the power
    iteration implicitly multiplies by is hash-gated here against a
    double-unnest DuckDB recomputation."""
    return analytics.embeddings_covariance(_t(spark, sf_dir, "embeddings"))


@register("events_user_churn_buckets",
          oracle=analytics.dd_events_user_churn_buckets_sql())
def events_user_churn_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_user_churn_buckets(_t(spark, sf_dir, "events"))


@register("events_retention_triangle",
          oracle=analytics.dd_retention_triangle_sql())
def events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-cohort retention triangle (distinct user-day grid
    -> per-user min window -> one aggregate; integer epoch-day math)."""
    return analytics.retention_triangle(_t(spark, sf_dir, "events"))


@register("events_ab_welch_ttest",
          oracle=analytics.dd_ab_welch_ttest_sql())
def events_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on value between two
    event types (one shared-partial aggregate + closed-form t and df)."""
    return analytics.ab_welch_ttest(_t(spark, sf_dir, "events"))


@register("lineitem_benford_check",
          oracle=analytics.dd_benford_check_sql())
def lineitem_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of extended prices: observed vs
    log10(1+1/d) share + per-digit chi-square contribution (one 9-row
    aggregate)."""
    return analytics.benford_check(_t(spark, sf_dir, "lineitem"))
