"""Relational + event-stream query registrations (star schema, SURVEY.md
§2.4 general-operator surface + streaming north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.catalog import load_table
from ..operators import events, relational
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register("tpch_q1_pricing_summary", oracle=relational.dd_tpch_q1_sql())
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q1(_t(spark, sf_dir, "lineitem"))


@register("tpch_q3_shipping_priority", oracle=relational.dd_tpch_q3_sql())
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q3(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register("tpch_q5_region_revenue", oracle=relational.dd_tpch_q5_sql())
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q5(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register(
    "top_orders_per_customer",
    oracle=relational.dd_top_orders_per_customer_sql(),
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_orders_per_customer(_t(spark, sf_dir, "orders"))


@register(
    "customer_nation_stats", oracle=relational.dd_customer_nation_stats_sql()
)
def customer_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customer_nation_stats(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "orders"),
    )


@register("lineitem_rollup", oracle=relational.dd_lineitem_rollup_sql())
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_rollup(_t(spark, sf_dir, "lineitem"))


@register(
    "orders_running_revenue",
    oracle=relational.dd_orders_running_revenue_sql(),
)
def orders_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.orders_running_revenue(_t(spark, sf_dir, "orders"))


@register("tpch_q4_order_priority", oracle=relational.dd_tpch_q4_sql())
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q4_order_priority(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register("tpch_q6_forecast_revenue", oracle=relational.dd_tpch_q6_sql())
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q6_forecast_revenue(_t(spark, sf_dir, "lineitem"))


@register("tpch_q12_shipmode", oracle=relational.dd_tpch_q12_sql())
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q12_shipmode(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register("tpch_q18_large_orders", oracle=relational.dd_tpch_q18_sql())
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q18_large_orders(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register("lineitem_cube", oracle=relational.dd_lineitem_cube_sql())
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_cube(_t(spark, sf_dir, "lineitem"))


@register("customer_set_ops", oracle=relational.dd_customer_set_ops_sql())
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customer_set_ops(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register("lineitem_quantiles", oracle=relational.dd_lineitem_quantiles_sql())
def lineitem_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_quantiles(_t(spark, sf_dir, "lineitem"))


@register("tpch_q10_returned_items", oracle=relational.dd_tpch_q10_sql())
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q10_returned_items(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "nation"),
    )


@register("tpch_q14_promo_revenue", oracle=relational.dd_tpch_q14_sql())
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q14_promo_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register("tpch_q16_supplier_variety", oracle=relational.dd_tpch_q16_sql())
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q16_supplier_variety(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
    )


@register(
    "scalar_function_showcase",
    oracle=relational.dd_scalar_function_showcase_sql(),
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.scalar_function_showcase(_t(spark, sf_dir, "orders"))


@register(
    "events_asof_click_purchase",
    oracle=events.dd_asof_click_before_purchase_sql(),
)
def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.asof_click_before_purchase(_t(spark, sf_dir, "events"))


@register("events_sessionization", oracle=events.dd_sessionize_sql())
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.sessionize(_t(spark, sf_dir, "events"))


@register("events_windowed_agg", oracle=events.dd_windowed_agg_sql())
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.windowed_agg(_t(spark, sf_dir, "events"))


@register("events_type_pivot", oracle=events.dd_event_type_pivot_sql())
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.event_type_pivot(_t(spark, sf_dir, "events"))


@register("events_props_json_stats", oracle=events.dd_props_json_stats_sql())
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.props_json_stats(_t(spark, sf_dir, "events"))


# --- round 2: remaining TPC-H shapes -----------------------------------------


@register("tpch_q7_volume_shipping", oracle=relational.dd_tpch_q7_sql())
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q7_volume_shipping(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("tpch_q8_market_share", oracle=relational.dd_tpch_q8_sql())
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q8_market_share(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register("tpch_q13_customer_distribution",
          oracle=relational.dd_tpch_q13_sql())
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q13_customer_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register("tpch_q15_top_supplier", oracle=relational.dd_tpch_q15_sql())
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q15_top_supplier(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier")
    )


@register("tpch_q17_small_qty_revenue", oracle=relational.dd_tpch_q17_sql())
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q17_small_qty_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register("tpch_q19_discounted_revenue", oracle=relational.dd_tpch_q19_sql())
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q19_discounted_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register("tpch_q21_waiting_suppliers", oracle=relational.dd_tpch_q21_sql())
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q21_waiting_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("tpch_q22_global_sales_opportunity",
          oracle=relational.dd_tpch_q22_sql())
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q22_global_sales_opportunity(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


# --- round 2: operator-breadth surface (unpivot, histogram, lag/ntile,
# multi-granularity rollup, sketch-quality) -----------------------------------


@register("lineitem_unpivot_measures",
          oracle=relational.dd_lineitem_unpivot_sql())
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_unpivot_measures(_t(spark, sf_dir, "lineitem"))


@register("part_size_histogram",
          oracle=relational.dd_part_size_histogram_sql())
def part_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.part_size_histogram(_t(spark, sf_dir, "part"))


@register("events_user_lag_deltas", oracle=events.dd_user_lag_deltas_sql())
def events_user_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.user_lag_deltas(_t(spark, sf_dir, "events"))


@register("events_multi_granularity_rollup",
          oracle=events.dd_multi_granularity_rollup_sql())
def events_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.multi_granularity_rollup(_t(spark, sf_dir, "events"))


@register("events_approx_distinct_users", oracle=None, bench=True)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.approx_distinct_users_error(_t(spark, sf_dir, "events"))


@register("events_session_range_join",
          oracle=events.dd_session_event_stats_sql())
def events_session_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.session_event_stats(_t(spark, sf_dir, "events"))


@register("events_funnel", oracle=events.dd_funnel_sql())
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.funnel_view_click_purchase(_t(spark, sf_dir, "events"))


@register(
    "lineitem_salted_join",
    oracle="""
SELECT o_orderpriority, count(*)::BIGINT AS n,
       round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2)::DOUBLE
         AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""".strip(),
)
def lineitem_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation as a registered, oracle-gated query: the salted
    fact-dim join must be result-identical to the plain join (the oracle
    IS the plain join). At scale this is the explicit answer to a
    known-hot key; AQE skew-join covers the unknown ones."""
    from pyspark.sql import functions as F

    from ..functions.skew import salted_join
    from ..operators.relational import money_sum

    joined = salted_join(
        _t(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
        num_salts=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register("lineitem_grouping_sets",
          oracle=relational.dd_lineitem_grouping_sets_sql())
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_grouping_sets(_t(spark, sf_dir, "lineitem"))


@register("customer_rfm_segments", oracle=relational.dd_customer_rfm_sql())
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customer_rfm_segments(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register("supplier_balance_outliers",
          oracle=relational.dd_supplier_outliers_sql())
def supplier_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.supplier_balance_outliers(_t(spark, sf_dir, "supplier"))


@register("events_props_map_stats", oracle=events.dd_props_map_stats_sql())
def events_props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.props_map_stats(_t(spark, sf_dir, "events"))


@register("orders_key_skew_stats", oracle=events.dd_key_skew_stats_sql())
def orders_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.key_skew_stats(_t(spark, sf_dir, "orders"))


@register("lineitem_quantile_approx_error", oracle=None, bench=True)
def lineitem_quantile_approx_error(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Sketch-quality metric for the percentile path (rows-only:
    approx_percentile's t-digest is engine-specific): exact vs approx p50/
    p95 of extended price with relative errors — the recorded evidence for
    swapping to the approx form at 100 TB.

    Both sides run over the SAME deterministic 1-in-8 hash subsample
    (xxhash64 of the row key): exact ``percentile`` buffers every input
    value in one final aggregation task, so full-column exact is the one
    part of this metric that cannot scale, and sampling only the exact
    side would conflate sampling error with sketch error. The subsample
    preserves the value distribution, so rel_err still measures what the
    sketch gets wrong on this data."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").where(
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)) == 0
    )
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_p50"
        ),
        F.expr("approx_percentile(l_extendedprice, 0.95, 1000)").alias(
            "approx_p95"
        ),
    )
    return row.select(
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("approx_p50", 2).alias("approx_p50"),
        F.round(
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            / F.col("exact_p50"),
            6,
        ).alias("rel_err_p50"),
        F.round("exact_p95", 2).alias("exact_p95"),
        F.round("approx_p95", 2).alias("approx_p95"),
        F.round(
            F.abs(F.col("approx_p95") - F.col("exact_p95"))
            / F.col("exact_p95"),
            6,
        ).alias("rel_err_p95"),
    )


@register("lineitem_bloom_join_prune", oracle=None, bench=True)
def lineitem_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, measured (rows-only: sketch membership
    is not SQL-reproducible): a deterministic md5-based bloom (m=65536
    bits, k=4) over the selective side's join keys, built and probed
    ENTIRELY inside the plan — the set-bit table is a distributed
    explode+distinct aggregate (bounded by m, never by data size) and is
    broadcast into the probe, so no key list ever lands on the driver.
    Recorded: probe-pass count vs the exact semi-join — the false-positive
    rate is the price of skipping the shuffle for pruned rows. Production
    Spark injects runtime bloom filters automatically; this makes the
    pattern and its quality an explicit recorded number (deterministic
    hashing -> the row is stable across rounds). Zero Python in the plan;
    all three counts come from ONE action."""
    from pyspark.sql import functions as F

    M = 1 << 16
    K = 4

    def pos(i: int, key: F.Column) -> F.Column:
        # int(md5(f"{i}:{key}").hexdigest()[:15], 16) % M, JVM-side
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(M),
        )

    li = _t(spark, sf_dir, "lineitem")
    sel_keys = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
    )
    # build: set-bit positions as a <=M-row table (distributed, exact)
    bits = sel_keys.select(
        F.explode(
            F.array(*[pos(i, F.col("o_orderkey")) for i in range(K)])
        ).alias("bit")
    ).distinct()

    # probe per DISTINCT fact key: all K positions must hit set bits
    # (duplicate positions join the same bit row twice, so count==K iff
    # every position is set — same as the bit-array .all())
    fact_keys = li.select("l_orderkey").distinct()
    hits = (
        fact_keys.select(
            "l_orderkey",
            F.explode(
                F.array(*[pos(i, F.col("l_orderkey")) for i in range(K)])
            ).alias("bit"),
        )
        .join(F.broadcast(bits), "bit")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    flags = (
        fact_keys
        .join(
            hits.where(F.col("h") == K).select(
                "l_orderkey", F.lit(1).alias("bloom_pass")
            ),
            "l_orderkey", "left",
        )
        .join(
            F.broadcast(sel_keys.select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.lit(1).alias("exact_pass"),
            )),
            "l_orderkey", "left",
        )
    )
    row = (
        li.select("l_orderkey")
        .join(flags, "l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.coalesce("exact_pass", F.lit(0))).alias("n_exact"),
            F.sum(F.coalesce("bloom_pass", F.lit(0))).alias("n_bloom_pass"),
        )
    )
    return row.select(
        "n_total", "n_exact", "n_bloom_pass",
        F.round(
            (F.col("n_bloom_pass") - F.col("n_exact"))
            / F.greatest(F.col("n_total") - F.col("n_exact"), F.lit(1)),
            6,
        ).alias("false_pos_rate"),
    )


@register("events_retention_cohorts", oracle=events.dd_retention_cohorts_sql())
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.retention_cohorts(_t(spark, sf_dir, "events"))


# --- TPC-H shapes over the synthesized partsupp (relational.py) -------------


@register("tpch_q2_min_cost_supplier", oracle=relational.dd_tpch_q2_sql())
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q2_min_cost_supplier(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register("tpch_q9_product_profit", oracle=relational.dd_tpch_q9_sql())
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q9_product_profit(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("tpch_q11_important_stock", oracle=relational.dd_tpch_q11_sql())
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q11_important_stock(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("tpch_q20_promotion_suppliers",
          oracle=relational.dd_tpch_q20_sql())
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.tpch_q20_promotion_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register("events_gap_fill_locf", oracle=events.dd_gap_fill_locf_sql())
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified daily series with last-observation-carried-forward
    (deferred from this round's gate window; rotates in next round)."""
    return events.gap_fill_locf(_t(spark, sf_dir, "events"))


@register("events_gap_fill_interpolate",
          oracle=events.dd_gap_fill_interpolate_sql())
def events_gap_fill_interpolate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    return events.gap_fill_interpolate(_t(spark, sf_dir, "events"))


@register("events_daily_anomaly_mad",
          oracle=events.dd_daily_anomaly_mad_sql())
def events_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.daily_anomaly_mad(_t(spark, sf_dir, "events"))


@register("part_name_fuzzy_match",
          oracle=relational.dd_part_name_fuzzy_match_sql())
def part_name_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.part_name_fuzzy_match(_t(spark, sf_dir, "part"))


@register("orders_moving_average",
          oracle=relational.dd_orders_moving_average_sql())
def orders_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.orders_moving_average(_t(spark, sf_dir, "orders"))


@register("customer_first_last_order",
          oracle=relational.dd_customer_first_last_order_sql())
def customer_first_last_order(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    return relational.customer_first_last_order(_t(spark, sf_dir, "orders"))


@register("lineitem_equi_depth_histogram",
          oracle=relational.dd_lineitem_equi_depth_histogram_sql())
def lineitem_equi_depth_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return relational.lineitem_equi_depth_histogram(
        _t(spark, sf_dir, "lineitem")
    )


@register("lineitem_geomean_udaf",
          oracle=relational.dd_lineitem_geomean_sql())
def lineitem_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lineitem_geomean_udaf(_t(spark, sf_dir, "lineitem"))


@register("customer_pareto_share",
          oracle=relational.dd_customer_pareto_share_sql())
def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customer_pareto_share(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"),
    )


@register("events_type_transition_matrix",
          oracle=events.dd_type_transition_matrix_sql())
def events_type_transition_matrix(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return events.type_transition_matrix(_t(spark, sf_dir, "events"))


@register("events_grouping_sets",
          oracle=events.dd_grouping_sets_rollup_sql())
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.grouping_sets_rollup(_t(spark, sf_dir, "events"))


@register("events_audience_overlap",
          oracle=events.dd_audience_overlap_sql())
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.audience_overlap(_t(spark, sf_dir, "events"))


@register("events_hll_error", oracle=None)
def events_hll_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: approx_count_distinct's HLL++ sketch is engine-internal;
    the recorded rel_err is the quality evidence (cf. text_countmin_error)."""
    return events.hll_distinct_error(_t(spark, sf_dir, "events"))


@register(
    "events_props_variant_stats", oracle=events.dd_props_json_stats_sql()
)
def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VariantType path over the same semi-structured contract
    (parse_json + try_variant_get); oracle identical to the JSON form."""
    return events.props_variant_stats(_t(spark, sf_dir, "events"))


@register(
    "events_session_distribution",
    oracle=events.dd_session_stats_distribution_sql(),
)
def events_session_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two session-size histogram with duration stats over the
    sessionizer output (exact integral duration sums)."""
    return events.session_stats_distribution(_t(spark, sf_dir, "events"))


@register(
    "events_latest_per_user", oracle=events.dd_latest_event_per_user_sql()
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC last-write-wins compaction (changelog -> snapshot)."""
    return events.latest_event_per_user(_t(spark, sf_dir, "events"))


@register("events_session_paths", oracle=events.dd_session_paths_sql())
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session event-type journeys (per-user windows -> in-task
    array_sort -> path hash aggregate -> TakeOrderedAndProject)."""
    return events.session_paths(_t(spark, sf_dir, "events"))


@register("part_type_arrays",
          oracle=relational.dd_part_type_arrays_sql())
def part_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function surface over grouped data (bounded-domain
    collect_set), DuckDB list-function parity."""
    return relational.part_type_arrays(_t(spark, sf_dir, "part"))


@register("customer_balance_percentiles",
          oracle=relational.dd_customer_balance_percentiles_sql())
def customer_balance_percentiles(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ANSI percentile_cont vs percentile_disc per segment."""
    return relational.customer_balance_percentiles(
        _t(spark, sf_dir, "customer")
    )


@register("orders_calendar_breakdown",
          oracle=relational.dd_orders_calendar_breakdown_sql())
def orders_calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (year, quarter) reporting rollup with ISO-week parity."""
    return relational.orders_calendar_breakdown(_t(spark, sf_dir, "orders"))


@register("customer_gini_by_nation",
          oracle=relational.dd_customer_gini_by_nation_sql())
def customer_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of account balances (per-nation rank windows)."""
    return relational.customer_gini_by_nation(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    )


@register("orders_ship_latency",
          oracle=relational.dd_orders_ship_latency_sql())
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order->ship latency per month with exact p50/p90."""
    return relational.orders_ship_latency(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )
