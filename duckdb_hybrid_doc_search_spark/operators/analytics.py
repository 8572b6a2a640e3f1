"""Statistical / temporal analytics operators: regression trends,
time-weighted averages, distribution moments, SCD2 interval builds,
k-means assignment, and corpus-mixture divergence.

These extend the engine past the reference's doc-search surface into the
analysis queries a training-data pipeline runs over the same tables
(drift detection, value trends, dimension versioning, cluster balance,
mixture skew). Everything here is built-in-aggregate / window work that
whole-stage-codegens on the JVM — no Python in any per-row path.

Scale notes (100 TB bar):
- Trend/moment queries are single hash aggregates with map-side partials
  (Catalyst rewrites regr_*/corr/covar into sum/count partials).
- TWAP and SCD2 use per-user / per-customer windows — partition sizes
  bounded by one entity's history, never a global sort.
- The k-means step broadcasts K centroid literals into a codegen'd
  expression; no join, no shuffle beyond the final K-row aggregate.
- KL divergence is two grouped aggregates plus a broadcast of the
  (≤ |langs|) corpus marginal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector
from .events import ts_micros

TREND_ROUND = 6
# 3rd/4th-moment partials merge in engine-specific order; ~1e-9 relative
# noise remains after the bias correction below, so round a bit coarser
KURT_ROUND = 4
KMEANS_K = 8


# --- events_value_trend ----------------------------------------------------


def events_value_trend(events: DataFrame) -> DataFrame:
    """Per event-type OLS trend of `value` over time (epoch days).

    One hash aggregate; regr_slope/intercept/corr all decompose into
    shared sum/sum², so Catalyst computes them in a single pass with
    map-side partial aggregation — scan-bound at any scale.
    """
    day = (ts_micros(events) / F.lit(86_400_000_000.0))
    return (
        events.select("event_type", day.alias("day"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope("value", "day"), TREND_ROUND).alias("slope"),
            F.round(F.regr_intercept("value", "day"), TREND_ROUND).alias(
                "intercept"
            ),
            F.round(F.corr("value", "day"), TREND_ROUND).alias("r"),
        )
        .orderBy("event_type")
    )


def dd_events_value_trend_sql() -> str:
    return f"""
SELECT event_type, count(*)::BIGINT AS n,
       round(regr_slope(value, epoch_us(ts) / 86400000000.0), {TREND_ROUND}) AS slope,
       round(regr_intercept(value, epoch_us(ts) / 86400000000.0), {TREND_ROUND}) AS intercept,
       round(corr(value, epoch_us(ts) / 86400000000.0), {TREND_ROUND}) AS r
FROM events GROUP BY event_type ORDER BY event_type
""".strip()


# --- events_user_twap ------------------------------------------------------


def events_user_twap(events: DataFrame) -> DataFrame:
    """Per-user time-weighted average of `value` (weight = time until the
    user's next event; the last event of a user carries no weight).

    The window partitions by user_id — partition size is one user's
    history, so this survives 100× data growth by adding partitions, not
    by growing any single sort. Users with a single event yield NULL.
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"), "value"
    )
    dt = (F.lead("us").over(w) - F.col("us")).cast("double")
    return (
        e.withColumn("dt", dt)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), TREND_ROUND
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


def dd_events_user_twap_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, value,
         (lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) - epoch_us(ts))::DOUBLE AS dt
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value * dt) / sum(dt), {TREND_ROUND}) AS twap
FROM e GROUP BY user_id ORDER BY user_id
""".strip()


# --- lineitem_stats_moments ------------------------------------------------


def lineitem_stats_moments(lineitem: DataFrame) -> DataFrame:
    """Per-returnflag distribution moments of extendedprice + its
    covariance/correlation with quantity — the drift-monitoring profile a
    pipeline records per data slice. Single hash aggregate.

    Spark's skewness/kurtosis are the population moments (g1, excess g2);
    DuckDB reports the sample-bias-corrected G1/G2, so the standard
    corrections are applied here to publish the G-statistics:
      G1 = g1 * sqrt(n(n-1)) / (n-2)
      G2 = (n-1)/((n-2)(n-3)) * ((n+1) * g2 + 6)
    """
    n = F.count(F.lit(1)).cast("double")
    g1 = F.skewness("l_extendedprice")
    g2 = F.kurtosis("l_extendedprice")
    big_g1 = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    big_g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_extendedprice"), TREND_ROUND).alias("mean_price"),
            F.round(F.stddev_samp("l_extendedprice"), TREND_ROUND).alias(
                "sd_price"
            ),
            F.round(big_g1, KURT_ROUND).alias("skew_price"),
            F.round(big_g2, KURT_ROUND).alias("kurt_price"),
            F.round(
                F.covar_samp("l_quantity", "l_extendedprice"), TREND_ROUND
            ).alias("cov_qty_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), TREND_ROUND).alias(
                "corr_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


def dd_lineitem_stats_moments_sql() -> str:
    return f"""
SELECT l_returnflag, count(*)::BIGINT AS n,
       round(avg(l_extendedprice), {TREND_ROUND}) AS mean_price,
       round(stddev_samp(l_extendedprice), {TREND_ROUND}) AS sd_price,
       round(skewness(l_extendedprice), {KURT_ROUND}) AS skew_price,
       round(kurtosis(l_extendedprice), {KURT_ROUND}) AS kurt_price,
       round(covar_samp(l_quantity, l_extendedprice), {TREND_ROUND}) AS cov_qty_price,
       round(corr(l_quantity, l_extendedprice), {TREND_ROUND}) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()


# --- orders_scd2_intervals -------------------------------------------------


def orders_scd2_intervals(orders: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: each order opens a
    validity interval on its customer that closes at the customer's next
    order (open-ended for the latest). The standard warehouse pattern for
    effective-dated dimensions, expressed as one per-customer lead()
    window — partition per customer, no global order.

    Output: o_custkey, valid_from/valid_to (epoch micros, NULL = open),
    o_orderkey, o_orderstatus, o_totalprice, is_current.
    """
    w = Window.partitionBy("o_custkey").orderBy("od_us", "o_orderkey")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    nxt = F.lead("od_us").over(w)
    return o.select(
        "o_custkey",
        F.col("od_us").alias("valid_from"),
        nxt.alias("valid_to"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        nxt.isNull().alias("is_current"),
    ).orderBy("o_custkey", "valid_from", "o_orderkey")


def dd_orders_scd2_intervals_sql() -> str:
    return """
SELECT o_custkey,
       epoch_us(o_orderdate) AS valid_from,
       lead(epoch_us(o_orderdate)) OVER w AS valid_to,
       o_orderkey, o_orderstatus, o_totalprice,
       (lead(epoch_us(o_orderdate)) OVER w IS NULL) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY epoch_us(o_orderdate), o_orderkey)
ORDER BY o_custkey, valid_from, o_orderkey
""".strip()


# --- embeddings_kmeans_step ------------------------------------------------


def embeddings_kmeans_step(embeddings: DataFrame) -> DataFrame:
    """One deterministic Lloyd assignment step: centroids are the K
    lowest-vec_id vectors; every vector is assigned to its nearest
    centroid (squared L2, ties to the lower centroid id).

    The K centroid vectors are collected (bounded: K rows) and inlined as
    literal arrays, so assignment is a codegen'd expression over the
    scan — zero joins/shuffles until the final K-row aggregate. This is
    exactly the shape a distributed k-means iteration has at 100 TB:
    broadcast centroids, map-side partial sums, K-row reduce.

    Output per cluster: n members, round(mean squared distance, 6).
    """
    init = (
        embeddings.orderBy("vec_id")
        .select("vec_id", "embedding")
        .limit(KMEANS_K)
        .collect()
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in init
    ]
    cluster_id, d2 = _kmeans_assign(embeddings, cents)
    return (
        embeddings.select(cluster_id, d2)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("d2"), TREND_ROUND).alias("mean_d2"),
        )
        .orderBy("cluster_id")
    )


def dd_embeddings_kmeans_step_sql() -> str:
    # same tie-break: (d2, cid) lexicographic min via ORDER BY d2, cid
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
),
assign AS (
  SELECT e.vec_id, c.cid,
         list_sum(list_transform(
           list_zip(e.embedding::DOUBLE[], c.cvec),
           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_sum(list_transform(
                              list_zip(e.embedding::DOUBLE[], c.cvec),
                              p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid)
           AS rk
  FROM embeddings e CROSS JOIN cents c
)
SELECT cid AS cluster_id, count(*)::BIGINT AS n,
       round(avg(d2), {TREND_ROUND}) AS mean_d2
FROM assign WHERE rk = 1
GROUP BY cid ORDER BY cid
""".strip()


# --- corpus_kl_source_lang -------------------------------------------------


def corpus_kl_source_lang(documents: DataFrame) -> DataFrame:
    """Per-source KL divergence of its language distribution vs the whole
    corpus — the mixture-skew diagnostic for training-data balance.

    ONE scan: the (source, lang) cell aggregate; every marginal (corpus
    lang distribution, per-source totals, grand total) derives from that
    ≤ |sources|×|langs|-row table via broadcast joins. At 100 TB the only
    full-data work is the initial map-side-combined count. The cell
    table is pinned with a (tiny) localCheckpoint — Catalyst does NOT
    dedupe common subplans, so without it each derived marginal would
    re-scan the full corpus (4 scans; measured 2x even at sf0.1).
    """
    cell = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    marg = cell.groupBy("lang").agg(F.sum("c").alias("lang_n"))
    total = marg.agg(F.sum("lang_n").alias("total_n"))
    src_tot = cell.groupBy("source").agg(F.sum("c").alias("src_n"))
    j = (
        cell.join(F.broadcast(src_tot), "source")
        .join(F.broadcast(marg), "lang")
        .crossJoin(F.broadcast(total))
        .withColumn("p_sl", F.col("c") / F.col("src_n"))
        .withColumn("p_lang", F.col("lang_n") / F.col("total_n"))
    )
    return (
        j.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("p_sl") * F.log(F.col("p_sl") / F.col("p_lang"))),
                TREND_ROUND,
            ).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


def dd_corpus_kl_source_lang_sql() -> str:
    return f"""
WITH marg AS (
  SELECT lang, count(*)::DOUBLE / (SELECT count(*) FROM documents) AS p_lang
  FROM documents GROUP BY lang
),
cell AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
),
srct AS (SELECT source, sum(c) AS src_n FROM cell GROUP BY source)
SELECT cell.source, sum(cell.c)::BIGINT AS n_docs,
       round(sum((cell.c / srct.src_n) *
                 ln((cell.c / srct.src_n) / marg.p_lang)), {TREND_ROUND})
         AS kl_vs_corpus
FROM cell JOIN srct ON cell.source = srct.source
          JOIN marg ON cell.lang = marg.lang
GROUP BY cell.source ORDER BY cell.source
""".strip()


# --- events_chi_square -----------------------------------------------------


def events_chi_square(events: DataFrame) -> DataFrame:
    """Chi-square independence contributions of event_type × day-of-week.

    ONE scan builds the contingency cells; marginals and the grand total
    derive from that ≤ |types|×7-row table (same single-scan shape as
    corpus_kl_source_lang, same localCheckpoint pin so the fact table is
    scanned once, not once per marginal). Expected counts
    e = row_n * col_n / n; output per type: its observed n and
    sum((o-e)^2/e) over its cells.
    """
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    cells = (
        events.select("event_type", (day % 7).alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    row_m = cells.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    col_m = cells.groupBy("dow").agg(F.sum("o").alias("col_n"))
    tot = row_m.agg(F.sum("row_n").alias("n"))
    j = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e",
            F.col("row_n").cast("double") * F.col("col_n") / F.col("n"),
        )
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.sum("o").cast("long").alias("n_events"),
            F.round(
                F.sum(
                    (F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
                    / F.col("e")
                ),
                TREND_ROUND,
            ).alias("chi2_contrib"),
        )
        .orderBy("event_type")
    )


def dd_events_chi_square_sql() -> str:
    return f"""
WITH cells AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
rowm AS (SELECT event_type, sum(o) AS row_n FROM cells GROUP BY 1),
colm AS (SELECT dow, sum(o) AS col_n FROM cells GROUP BY 1),
tot AS (SELECT sum(row_n) AS n FROM rowm)
SELECT c.event_type, sum(c.o)::BIGINT AS n_events,
       round(sum((c.o - e.e) * (c.o - e.e) / e.e), {TREND_ROUND})
         AS chi2_contrib
FROM cells c
JOIN rowm USING (event_type) JOIN colm USING (dow) CROSS JOIN tot,
LATERAL (SELECT rowm.row_n::DOUBLE * colm.col_n / tot.n AS e) e
GROUP BY c.event_type ORDER BY c.event_type
""".strip()


# --- events_rolling_active_users -------------------------------------------

ROLLING_DAYS = 7


def events_rolling_active_users(events: DataFrame) -> DataFrame:
    """Daily + trailing-7-day distinct active users per day observed in
    the data — the sliding-window COUNT DISTINCT that plain windowed
    aggregation cannot express (distinct does not decompose).

    Shape: distinct (user, day) pairs, then a bounded ×7 explode of each
    pair into the days it keeps the user "active", then two grouped
    counts. Fan-out is exactly ROLLING_DAYS — no range self-join, no
    per-day rescan — so cost stays linear in |user-days| at any scale.
    """
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    daily = ud.groupBy("day").agg(F.count(F.lit(1)).alias("n_active_1d"))
    week = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (ROLLING_DAYS - 1))
            ).alias("obs_day"),
        )
        .distinct()
        .groupBy("obs_day")
        .agg(F.count(F.lit(1)).alias("n_active_7d"))
    )
    return (
        daily.join(week, daily["day"] == week["obs_day"])
        .select("day", "n_active_1d", "n_active_7d")
        .orderBy("day")
    )


def dd_events_rolling_active_users_sql() -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
daily AS (SELECT day, count(*)::BIGINT AS n_active_1d FROM ud GROUP BY day),
week AS (
  SELECT obs_day, count(*)::BIGINT AS n_active_7d FROM (
    SELECT DISTINCT user_id, unnest(range(day, day + {ROLLING_DAYS})) AS obs_day
    FROM ud
  ) GROUP BY obs_day
)
SELECT daily.day, daily.n_active_1d, week.n_active_7d
FROM daily JOIN week ON week.obs_day = daily.day
ORDER BY daily.day
""".strip()


# --- orders_window_showcase ------------------------------------------------


def orders_window_showcase(orders: DataFrame) -> DataFrame:
    """Ranking-window surface in one pass: rank, dense_rank,
    percent_rank, cume_dist, ntile(4) and nth_value(2), all over the SAME
    per-customer (o_orderdate, o_orderkey) window — Catalyst evaluates
    every function in a single Window operator, one shuffle on o_custkey,
    partitions bounded by one customer's order history.
    """
    w = Window.partitionBy("o_custkey").orderBy("od_us", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), TREND_ROUND).alias("prnk"),
        F.round(F.cume_dist().over(w), TREND_ROUND).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


def dd_orders_window_showcase_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       round(percent_rank() OVER w, {TREND_ROUND}) AS prnk,
       round(cume_dist() OVER w, {TREND_ROUND}) AS cdist,
       ntile(4) OVER w AS quartile,
       nth_value(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY epoch_us(o_orderdate), o_orderkey)
ORDER BY o_custkey, o_orderkey
""".strip()


# --- orders_cohort_ltv -----------------------------------------------------


def orders_cohort_ltv(orders: DataFrame) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohorted by first-order
    month; per (cohort_month, age_months) cell — orders, active
    customers, revenue, and cumulative revenue along the cohort's age.

    One shuffle on o_custkey computes the cohort month as a window min
    (no separate dim build + re-join); the cumulative window partitions
    by cohort_month with ≤ |months| rows per partition. Money sums in
    DECIMAL(30,8) (relational.money_sum) so cross-engine totals are
    exact, not float-order-dependent.
    """
    from .relational import money_sum

    m = (
        F.year(F.col("o_orderdate").cast("timestamp")) * 12
        + F.month(F.col("o_orderdate").cast("timestamp"))
        - 1
    )
    w = Window.partitionBy("o_custkey")
    o = orders.select(
        "o_custkey", "o_totalprice", m.alias("month")
    ).withColumn("cohort_m", F.min("month").over(w))
    cells = (
        o.groupBy("cohort_m", (F.col("month") - F.col("cohort_m")).alias("age"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    wc = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn(
            "cum_revenue", F.round(F.sum("revenue").over(wc), 2)
        )
        .orderBy("cohort_m", "age")
    )


def dd_orders_cohort_ltv_sql() -> str:
    from .relational import dd_money_sum

    return f"""
WITH o AS (
  SELECT o_custkey, o_totalprice,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS month,
         min(year(o_orderdate) * 12 + month(o_orderdate) - 1)
           OVER (PARTITION BY o_custkey) AS cohort_m
  FROM orders
),
cells AS (
  SELECT cohort_m, month - cohort_m AS age,
         count(*)::BIGINT AS n_orders,
         count(DISTINCT o_custkey)::BIGINT AS n_customers,
         {dd_money_sum('o_totalprice')} AS revenue
  FROM o GROUP BY cohort_m, age
)
SELECT cohort_m, age, n_orders, n_customers, revenue,
       round(sum(revenue) OVER (PARTITION BY cohort_m ORDER BY age
         ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
FROM cells ORDER BY cohort_m, age
""".strip()


# --- orders_yoy_growth -----------------------------------------------------


def orders_yoy_growth(orders: DataFrame) -> DataFrame:
    """Year-over-year revenue growth per order priority: yearly DECIMAL
    money sums, then lag() along each priority's ≤|years|-row series —
    the aggregate shrinks the fact table before any window touches it.
    """
    from .relational import money_sum

    yearly = (
        orders.groupBy(
            "o_orderpriority",
            F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
        )
        .agg(money_sum(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return (
        yearly.select(
            "o_orderpriority",
            "yr",
            "revenue",
            F.round(
                (F.col("revenue") - prev) / prev, TREND_ROUND
            ).alias("yoy_growth"),
        )
        .orderBy("o_orderpriority", "yr")
    )


def dd_orders_yoy_growth_sql() -> str:
    from .relational import dd_money_sum

    return f"""
WITH yearly AS (
  SELECT o_orderpriority, year(o_orderdate) AS yr,
         {dd_money_sum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, yr, revenue,
       round((revenue - lag(revenue) OVER w) / lag(revenue) OVER w,
             {TREND_ROUND}) AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
ORDER BY o_orderpriority, yr
""".strip()


# --- embeddings_kmeans_train -----------------------------------------------

KMEANS_ITERS = 5


def _kmeans_assign(embeddings: DataFrame, cents: list[tuple[int, list[float]]]):
    """(cluster_id, d2) columns for nearest-centroid assignment against
    literal centroid vectors (ties to lower centroid id). Shared by the
    single oracle-gated step and the iterative trainer."""
    dist_structs = []
    for cid, vec in cents:
        c = vector.lit_vector(vec)
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dist_structs.append(
            F.struct(d2.alias("d2"), F.lit(int(cid)).alias("cid"))
        )
    best = F.array_min(F.array(*dist_structs))
    return best["cid"].alias("cluster_id"), best["d2"].alias("d2")


def _kmeans_assign_arrow(embeddings: DataFrame,
                         cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(cluster_id, d2, embedding) via one Arrow-batched GEMM pass —
    the TRAINER's assignment. Numerically it is the same nearest-centroid
    rule as the catalyst `_kmeans_assign` (ties to lower centroid id:
    centroid rows are cid-sorted and argmin takes the first minimum),
    but per-batch numpy `|x|^2 + |c|^2 - 2 x·C^T` replaces K interpreted
    zip_with/aggregate lambdas per row: the iterative loop was spending
    ~1.3 s/iteration at sf0.1 in HOF interpretation + per-iteration
    codegen of fresh centroid literals (r5 measurement, PERF_NOTES.md),
    while the Arrow pass keeps a constant plan shape across iterations."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    C = np.array([cents[i][1] for i in order], dtype=np.float64)
    cids = np.array([cents[i][0] for i in order], dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d2 = np.maximum(
                (X * X).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (X @ C.T),
                0.0,
            )
            best = d2.argmin(axis=1)  # first min = lowest cid (cid-sorted)
            yield pd.DataFrame({
                "cluster_id": cids[best],
                "d2": d2[np.arange(len(best)), best],
                "embedding": pdf["embedding"],
            })

    return embeddings.select("embedding").mapInPandas(
        fn, "cluster_id long, d2 double, embedding array<float>"
    )


def _kmeans_iter_partials(embeddings: DataFrame,
                          cents: list[tuple[int, list[float]]]) -> list:
    """One Lloyd iteration's sufficient statistics in ONE stage: the
    assignment GEMM emits per-batch PARTIALS (cluster_id, n, sum_d2,
    sum_vec) instead of shipping every (cluster_id, d2, embedding) row
    back through Arrow for a JVM aggregate with dim avg-expressions —
    the r14 swap of a 2-stage (map + exchange + 2·dim aggregate) pass
    for a map-only pass whose output is bounded by K x arrow-batches
    (the embeddings_covariance partial pattern; guide §2.3 "aggregate
    before you shuffle" taken to its limit: nothing shuffles). The
    driver merges the partials — K x dim floats, same bound the
    centroid loop already holds."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    C = np.array([cents[i][1] for i in order], dtype=np.float64)
    cids = np.array([cents[i][0] for i in order], dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d2 = np.maximum(
                (X * X).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (X @ C.T),
                0.0,
            )
            best = d2.argmin(axis=1)  # first min = lowest cid (cid-sorted)
            rows = []
            for idx in np.unique(best):
                m = best == idx
                rows.append((
                    int(cids[idx]),
                    int(m.sum()),
                    float(d2[m, idx].sum()),
                    X[m].sum(axis=0).tolist(),
                ))
            yield pd.DataFrame(
                rows, columns=["cluster_id", "n", "sd2", "sums"]
            )

    return embeddings.select("embedding").mapInPandas(
        fn, "cluster_id long, n long, sd2 double, sums array<double>"
    ).collect()


def embeddings_kmeans_train(embeddings: DataFrame) -> DataFrame:
    """Full Lloyd's k-means, KMEANS_ITERS iterations: per iteration one
    Arrow-GEMM assignment pass (`_kmeans_assign_arrow`) and one K-row
    aggregate computing the new means + inertia. The driver loop holds
    only K×dim floats — the classic distributed-kmeans shape; no N×K
    join materialization, and the per-iteration plan shape is constant
    so nothing recompiles between passes.

    Rows-only (seeded float iteration isn't SQL-expressible across
    engines); tests pin inertia monotonicity and partition totals. The
    oracle-gated single step (`embeddings_kmeans_step`) stays on the
    catalyst literal-centroid expression, which IS DuckDB-checkable.

    Output: one row per (iteration, cluster_id) with n, mean_d2.
    """
    init = (
        embeddings.orderBy("vec_id")
        .select("vec_id", "embedding")
        .limit(KMEANS_K)
        .collect()
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in init
    ]
    history = []
    spark = embeddings.sparkSession
    for it in range(KMEANS_ITERS):
        # merge the map-side partials driver-side (K x dim floats — the
        # bound the loop already holds for the centroids themselves)
        agg: dict[int, tuple[int, float, list[float]]] = {}
        for r in _kmeans_iter_partials(embeddings, cents):
            cid = int(r["cluster_id"])
            n0, sd0, s0 = agg.get(cid, (0, 0.0, None))
            sums = list(r["sums"]) if s0 is None else [
                a + b for a, b in zip(s0, r["sums"])
            ]
            agg[cid] = (n0 + int(r["n"]), sd0 + float(r["sd2"]), sums)
        for cid in sorted(agg):
            n, sd2, _ = agg[cid]
            history.append((it, cid, n, float(round(sd2 / n, TREND_ROUND))))
        # empty clusters keep their previous centroid (standard Lloyd fix)
        cents = [
            (cid, [s / agg[cid][0] for s in agg[cid][2]]
             if cid in agg else vec)
            for cid, vec in cents
        ]
    return spark.createDataFrame(
        history, "iteration int, cluster_id long, n long, mean_d2 double"
    )


# --- events_user_decay_avg --------------------------------------------------

DECAY = 0.7          # weight multiplier per step back in time
DECAY_HORIZON = 50   # only the last N events carry weight


def events_user_decay_avg(events: DataFrame) -> DataFrame:
    """Per-user exponentially-decayed recency-weighted average of
    `value`: weight (DECAY)^k for the k-th most recent event, truncated
    to the last DECAY_HORIZON events.

    The bounded horizon is deliberate, not a shortcut: (0.7)^50 ~ 2e-8
    so the tail is numerically irrelevant, and it makes the operator
    scale-safe — an unbounded EWMA via the pow-window trick needs
    (1-a)^(-i) terms that overflow doubles past ~2k events/user, while
    this form is a per-user row_number (partition = one user's history)
    plus a hash aggregate. Deterministic tie-break on event_id.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"), "value"
    )
    ranked = (
        e.withColumn("k", F.row_number().over(w) - 1)
        .where(F.col("k") < DECAY_HORIZON)
        .withColumn("wt", F.pow(F.lit(DECAY), F.col("k")))
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            F.round(
                F.sum(F.col("wt") * F.col("value")) / F.sum("wt"),
                TREND_ROUND,
            ).alias("decay_avg"),
        )
        .orderBy("user_id")
    )


def dd_events_user_decay_avg_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts) DESC, event_id DESC) - 1 AS k
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_recent,
       round(sum(pow({DECAY}, k) * value) / sum(pow({DECAY}, k)),
             {TREND_ROUND}) AS decay_avg
FROM ranked WHERE k < {DECAY_HORIZON}
GROUP BY user_id ORDER BY user_id
""".strip()


# --- events_hll_union_types -------------------------------------------------


def events_hll_union_types(events: DataFrame) -> DataFrame:
    """Mergeable-sketch distinct counting: one HLL sketch of user_id per
    event type (Datasketches HllSketch via hll_sketch_agg), then the
    per-type sketches UNION-merged (hll_union_agg) into a corpus-wide
    estimate — recorded against the exact distinct counts.

    This is the pre-aggregation contract that makes 100 TB dashboards
    cheap: materialize one small sketch per (type, partition), answer
    any union of slices by merging sketches — never rescan raw events.
    Deterministic (HLL is hash-based, no RNG); rows-only because sketch
    internals are not SQL-expressible — the recorded rel_err IS the
    gate, same discipline as the HLL++/count-min error rows.
    """
    sk = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("estimate"),
        "exact",
    )
    merged = sk.agg(F.hll_union_agg("sk").alias("msk"))
    total = events.agg(F.countDistinct("user_id").alias("exact"))
    merged_row = merged.crossJoin(F.broadcast(total)).select(
        F.lit("__merged__").alias("event_type"),
        F.hll_sketch_estimate("msk").cast("long").alias("estimate"),
        "exact",
    )
    return (
        per_type.unionByName(merged_row)
        .select(
            "event_type", "estimate", "exact",
            F.round(
                F.abs(F.col("estimate") - F.col("exact"))
                / F.col("exact"),
                TREND_ROUND,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# --- events_range_frame_sum -------------------------------------------------

RANGE_FRAME_US = 3600 * 1_000_000  # 1h trailing window


def events_range_frame_sum(events: DataFrame) -> DataFrame:
    """Time-RANGE window frames: per event, the count and value-sum of
    the same user's events in the trailing hour (RANGE BETWEEN 3600s
    PRECEDING AND CURRENT ROW over epoch-micro event time) — the frame
    semantics tumbling windows can't express (every row gets its own
    trailing window).

    Partitioned per user; within a partition the range frame is a
    two-pointer sweep over the sorted history — linear, no self-join
    blowup, and partition size stays one user's history at any corpus
    scale. Ties at the same timestamp all enter the frame (RANGE, not
    ROWS) — deterministic regardless of intra-ts order.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-RANGE_FRAME_US, 0)
    )
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"), "value"
    )
    return (
        e.select(
            "user_id", "event_id", "us",
            F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), TREND_ROUND)
            .alias("sum_trailing_1h"),
        )
        .orderBy("user_id", "us", "event_id")
    )


def dd_events_range_frame_sum_sql() -> str:
    return f"""
SELECT user_id, event_id, epoch_us(ts) AS us,
       count(*) OVER w AS n_trailing_1h,
       round(sum(value) OVER w, {TREND_ROUND}) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {RANGE_FRAME_US} PRECEDING AND CURRENT ROW)
ORDER BY user_id, us, event_id
""".strip()


# --- events_data_quality ----------------------------------------------------


def events_data_quality(events: DataFrame) -> DataFrame:
    """Per-user data-quality audit: event count, distinct ids, id-range
    coverage (ids missing between the user's min and max), duplicate-id
    flag, and null-value count — the integrity profile a pipeline runs
    before trusting an ingest partition. One hash aggregate, map-side
    partials, no windows."""
    e = events.select("user_id", "event_id", "value")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("n_distinct_ids"),
            (
                F.max("event_id") - F.min("event_id") + 1
                - F.countDistinct("event_id")
            ).alias("ids_missing_in_range"),
            (F.count(F.lit(1)) > F.countDistinct("event_id"))
            .alias("has_dup_ids"),
            F.sum(
                F.when(F.col("value").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_null_values"),
        )
        .orderBy("user_id")
    )


def dd_events_data_quality_sql() -> str:
    return """
SELECT user_id, count(*)::BIGINT AS n,
       count(DISTINCT event_id)::BIGINT AS n_distinct_ids,
       (max(event_id) - min(event_id) + 1
        - count(DISTINCT event_id))::BIGINT AS ids_missing_in_range,
       (count(*) > count(DISTINCT event_id)) AS has_dup_ids,
       sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_null_values
FROM events GROUP BY user_id ORDER BY user_id
""".strip()


# --- embeddings_pca_power ---------------------------------------------------

PCA_ITERS = 4


def embeddings_pca_power(embeddings: DataFrame) -> DataFrame:
    """Top principal direction of the (mean-centered) embeddings by
    distributed power iteration — the PCA primitive without ever
    materializing the D×D covariance: each step computes
    w = avg_i((x_i-μ)·v · (x_i-μ)) as ONE hash aggregate of D
    expressions (v inlined as a literal vector, all codegen), normalizes
    driver-side (D floats), and repeats. Deterministic e_1 init.

    Per iteration the driver sees D doubles — never rows. At 100 TB the
    aggregate is scan-bound with map-side partials; D (=dim) bounds both
    the expression count and the driver traffic. Output: per-iteration
    eigenvalue estimate (Rayleigh quotient) and the cosine between
    successive directions (convergence trace) — rows-only (iterative
    float fixpoint), same discipline as embeddings_kmeans_train.
    """
    import math

    from ..functions import vector

    spark = embeddings.sparkSession
    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None:
        return spark.createDataFrame(
            [], "iteration int, eigenvalue double, cos_prev double"
        )
    dim = int(first["d"])
    # r14: the mean via the same Arrow partial-sum pass the iteration
    # uses (D rows per partition, merged driver-side) instead of a
    # D-column codegen avg aggregate — at a production D=1024 the
    # expression form compiles 1024 aggregate expressions into one
    # stage (the whiten_stats codegen-width hazard). Output pinned
    # equal to the expression form at sf0.001/0.01/0.1.
    import numpy as np
    import pandas as pd

    def mu_partials(batches):
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            s += X.sum(axis=0)
            n += len(X)
        yield pd.DataFrame({
            "pos": np.arange(dim, dtype=np.int32), "s": s,
            "n": np.full(dim, n, dtype=np.int64),
        })

    mu_rows = embeddings.select("embedding").mapInPandas(
        mu_partials, "pos int, s double, n long").collect()
    mu_n = sum(r["n"] for r in mu_rows if r["pos"] == 0)
    mu_sums = [0.0] * dim
    for r in mu_rows:
        mu_sums[r["pos"]] += r["s"]
    mu_v = [s / mu_n for s in mu_sums]

    centered = embeddings.select(
        F.array(
            *[
                F.col("embedding").getItem(j).cast("double") - mu_v[j]
                for j in range(dim)
            ]
        ).alias("x")
    ).localCheckpoint(eager=False)

    v = [0.0] * dim
    v[0] = 1.0
    history = []
    for it in range(PCA_ITERS):
        # Arrow-GEMM partial sums: each partition emits ONE D-row frame
        # of sum_i dot(x_i, v)·x_i partials; the driver merges D×
        # partitions rows. Earlier variants were measured and rejected
        # (r5, sf0.1, 6 iters): literal-v catalyst aggregate 5.8s (D
        # interpreted avg expressions recompiled per step), broadcast
        # one-row v DataFrame 8.9s (join machinery). The numpy pass runs
        # the same step in ~1 job of batch GEMMs with a constant plan
        # shape, and the driver still only ever sees D-sized state.
        w_parts = _pca_step_partials(centered, v, dim).collect()
        total_n = sum(r["n"] for r in w_parts if r["pos"] == 0)
        sums = [0.0] * dim
        for r in w_parts:
            sums[r["pos"]] += r["s"]
        w = [s / total_n for s in sums]
        nrm = math.sqrt(sum(c * c for c in w)) or 1.0
        new_v = [c / nrm for c in w]
        cos_prev = sum(a * b for a, b in zip(new_v, v))
        history.append((it, round(nrm, TREND_ROUND),
                        round(abs(cos_prev), TREND_ROUND)))
        v = new_v
    return spark.createDataFrame(
        history, "iteration int, eigenvalue double, cos_prev double"
    )


def _pca_step_partials(centered: DataFrame, v: list[float],
                       dim: int) -> DataFrame:
    """Per-partition partial sums of dot(x, v)·x as (pos, s, n) rows —
    D rows per partition, merged driver-side by embeddings_pca_power."""
    import numpy as np
    import pandas as pd

    vv = np.array(v, dtype=np.float64)

    def fn(batches):
        S = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["x"].tolist(), dtype=np.float64)
            S += (X @ vv) @ X
            n += len(X)
        yield pd.DataFrame({
            "pos": np.arange(dim, dtype=np.int32), "s": S,
            "n": np.full(dim, n, dtype=np.int64),
        })

    return centered.mapInPandas(fn, "pos int, s double, n long")


# --- events_user_churn_buckets ----------------------------------------------


def events_user_churn_buckets(events: DataFrame) -> DataFrame:
    """User-lifecycle churn profile: bucket every user by WEEKS since
    their last event (relative to the corpus's max event time) and
    count users per bucket with a >=4-weeks churn flag — the inactivity
    distribution a retention dashboard draws.

    Shape: per-user max(us) hash aggregate (map-side combined) -> the
    corpus max as a broadcast scalar -> arithmetic bucketing -> a
    bucket-count aggregate over at most |weeks| rows. No windows, no
    sort beyond the bounded presentation ORDER BY.
    """
    per_user = events.select(
        "user_id", ts_micros(events).alias("us")
    ).groupBy("user_id").agg(F.max("us").alias("last_us"))
    mx = per_user.agg(F.max("last_us").alias("max_us"))
    wk = (
        (F.col("max_us") - F.col("last_us"))
        / F.lit(7 * 86400 * 1_000_000)
    ).cast("long")
    return (
        per_user.crossJoin(F.broadcast(mx))
        .select(wk.alias("weeks_inactive"))
        .groupBy("weeks_inactive")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "weeks_inactive", "n_users",
            (F.col("weeks_inactive") >= 4).alias("churned"),
        )
        .orderBy("weeks_inactive")
    )


def dd_events_user_churn_buckets_sql() -> str:
    return """
WITH per_user AS (
  SELECT user_id, max(epoch_us(ts)) AS last_us FROM events GROUP BY user_id
),
mx AS (SELECT max(last_us) AS max_us FROM per_user)
SELECT weeks_inactive, count(*)::BIGINT AS n_users,
       (weeks_inactive >= 4) AS churned
FROM (
  SELECT ((max_us - last_us) // (7::BIGINT * 86400 * 1000000))::BIGINT
           AS weeks_inactive
  FROM per_user CROSS JOIN mx
)
GROUP BY weeks_inactive ORDER BY weeks_inactive
""".strip()


# --- events_retention_triangle ------------------------------------------------

RETENTION_ANCHOR_DAY = 19723  # epoch day of 2024-01-01 (events corpus start)
RETENTION_EVENT = "purchase"  # retained = came back and purchased
RETENTION_ROUND = 6


def retention_triangle(events: DataFrame) -> DataFrame:
    """Classic cohort retention triangle, daily grain: users bucketed by
    the day of their FIRST purchase (cohort), counted distinct on every
    later purchase day, reported as n_active + retention vs the cohort's
    day-0 size. Purchase-only (the sparse "retained" action) — the full
    event stream is saturated at test scale, which would flatten every
    rate to 1.0.

    Shape: events collapse to the DISTINCT (user, day) activity grid
    first (one shuffle; grid is |users| x |days|, tiny next to raw
    events), cohort day via a per-user min window over that grid (user-
    partitioned — no global window), one aggregate for the triangle, and
    a broadcast self-join pins day-0 sizes. All integer epoch-day math
    (micros // day), identical in DuckDB.

    Output: cohort_day, day_offset, n_active, cohort_size, retention.
    """
    from pyspark.sql import Window

    day = (
        (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
        - F.lit(RETENTION_ANCHOR_DAY)
    ).cast("int")
    grid = (
        events.where(F.col("event_type") == RETENTION_EVENT)
        .select("user_id", day.alias("day_idx"))
        .distinct()
    )
    w_user = Window.partitionBy("user_id")
    cohorts = grid.withColumn(
        "cohort_day", F.min("day_idx").over(w_user)
    )
    tri = cohorts.groupBy(
        "cohort_day",
        (F.col("day_idx") - F.col("cohort_day")).alias("day_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active"))
    base = tri.where(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_active").alias("cohort_size")
    )
    return (
        tri.join(F.broadcast(base), "cohort_day")
        .select(
            "cohort_day", "day_offset", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"),
                    RETENTION_ROUND).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


def dd_retention_triangle_sql(table: str = "events") -> str:
    return f"""
WITH grid AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 86400000000 - {RETENTION_ANCHOR_DAY})::INT
           AS day_idx
  FROM {table} WHERE event_type = '{RETENTION_EVENT}'
),
cohorts AS (
  SELECT user_id, day_idx,
         min(day_idx) OVER (PARTITION BY user_id) AS cohort_day
  FROM grid
),
tri AS (
  SELECT cohort_day, day_idx - cohort_day AS day_offset,
         count(DISTINCT user_id)::BIGINT AS n_active
  FROM cohorts GROUP BY 1, 2
),
base AS (
  SELECT cohort_day, n_active AS cohort_size FROM tri WHERE day_offset = 0
)
SELECT t.cohort_day, t.day_offset, t.n_active, b.cohort_size,
       round(t.n_active * 1.0 / b.cohort_size, {RETENTION_ROUND})
         AS retention
FROM tri t JOIN base b USING (cohort_day)
ORDER BY t.cohort_day, t.day_offset
""".strip()


# --- events_ab_welch_ttest ------------------------------------------------------

AB_GROUP_A = "click"
AB_GROUP_B = "purchase"


def ab_welch_ttest(events: DataFrame) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on `value` between two
    event types — the A/B significance primitive every experimentation
    pipeline runs. Closed form: per-group n / mean / sample variance from
    ONE shared-partial aggregate, then t = (m_a - m_b) / sqrt(v_a/n_a +
    v_b/n_b) and the Welch-Satterthwaite df — pure arithmetic on a 2-row
    table, scan-bound at any scale.

    Output: one row with per-group stats, t_stat, and df.
    """
    g = (
        events.where(F.col("event_type").isin(AB_GROUP_A, AB_GROUP_B))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
    )
    a = g.where(F.col("event_type") == AB_GROUP_A).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = g.where(F.col("event_type") == AB_GROUP_B).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb)
    df = (
        (sa + sb) * (sa + sb)
        / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1))
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a", F.round("mean_a", TREND_ROUND).alias("mean_a"),
        F.round("var_a", TREND_ROUND).alias("var_a"),
        "n_b", F.round("mean_b", TREND_ROUND).alias("mean_b"),
        F.round("var_b", TREND_ROUND).alias("var_b"),
        F.round(t, TREND_ROUND).alias("t_stat"),
        F.round(df, TREND_ROUND).alias("df"),
    )


def dd_ab_welch_ttest_sql(table: str = "events") -> str:
    return f"""
WITH g AS (
  SELECT event_type, count(*)::BIGINT AS n, avg(value) AS mean,
         var_samp(value) AS var
  FROM {table}
  WHERE event_type IN ('{AB_GROUP_A}', '{AB_GROUP_B}')
  GROUP BY event_type
),
a AS (SELECT n AS n_a, mean AS mean_a, var AS var_a FROM g
      WHERE event_type = '{AB_GROUP_A}'),
b AS (SELECT n AS n_b, mean AS mean_b, var AS var_b FROM g
      WHERE event_type = '{AB_GROUP_B}')
SELECT n_a, round(mean_a, {TREND_ROUND}) AS mean_a,
       round(var_a, {TREND_ROUND}) AS var_a,
       n_b, round(mean_b, {TREND_ROUND}) AS mean_b,
       round(var_b, {TREND_ROUND}) AS var_b,
       round((mean_a - mean_b)
             / sqrt(var_a / n_a + var_b / n_b), {TREND_ROUND}) AS t_stat,
       round(pow(var_a / n_a + var_b / n_b, 2)
             / (pow(var_a / n_a, 2) / (n_a - 1)
                + pow(var_b / n_b, 2) / (n_b - 1)), {TREND_ROUND}) AS df
FROM a CROSS JOIN b
""".strip()


# --- lineitem_benford_check -----------------------------------------------------


def benford_check(lineitem: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of l_extendedprice — the
    fraud/synthetic-data smoke test: observed share of each leading
    digit vs the Benford expectation log10(1 + 1/d), plus the chi-square
    contribution per digit. One scan, one 9-row aggregate.

    (Synthetic TPC-H prices are NOT Benford-distributed — the recorded
    deviation is the point: the check flags exactly this kind of
    generated data.)
    """
    import math

    d = F.substring(F.col("l_extendedprice").cast("string"), 1, 1).cast("int")
    counts = (
        lineitem.select(d.alias("digit"))
        .where(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    expected = F.lit(None).cast("double")
    for dd in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == dd, F.lit(math.log10(1 + 1 / dd))
        ).otherwise(expected)
    obs = F.col("n") / F.col("total")
    chi = (
        (obs - expected) * (obs - expected) / expected * F.col("total")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            F.round(obs, TREND_ROUND).alias("observed_share"),
            F.round(expected, TREND_ROUND).alias("benford_share"),
            F.round(chi, TREND_ROUND).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


def dd_benford_check_sql(table: str = "lineitem") -> str:
    import math

    # ::DOUBLE on the literal — a long numeric literal is DECIMAL in
    # DuckDB, which the driver renders as '0.301030' vs double '0.30103'
    cases = " ".join(
        f"WHEN digit = {d} THEN {math.log10(1 + 1 / d)!r}::DOUBLE"
        for d in range(1, 10)
    )
    return f"""
WITH counts AS (
  SELECT substr(l_extendedprice::VARCHAR, 1, 1)::INT AS digit,
         count(*)::BIGINT AS n
  FROM {table}
  WHERE substr(l_extendedprice::VARCHAR, 1, 1)::INT BETWEEN 1 AND 9
  GROUP BY 1
),
tot AS (SELECT sum(n)::DOUBLE AS total FROM counts)
SELECT digit, n,
       round(n / total, {TREND_ROUND}) AS observed_share,
       round(CASE {cases} END, {TREND_ROUND}) AS benford_share,
       round(pow(n / total - (CASE {cases} END), 2)
             / (CASE {cases} END) * total, {TREND_ROUND}) AS chi2_contrib
FROM counts CROSS JOIN tot
ORDER BY digit
""".strip()


# --- embeddings_covariance ---------------------------------------------------


def embeddings_covariance(embeddings: DataFrame) -> DataFrame:
    """Upper-triangle population covariance of the embedding matrix —
    the preprocessing statistic whitening/PCA-based curation pipelines
    (SemDeDup-style) need before any distance is trustworthy on
    anisotropic embeddings.

    ONE corpus pass: each partition reduces to a single (D x D GEMM +
    column sums) Arrow batch via mapInPandas — the _pca_step_partials
    pattern, here emitting D(D+1)/2 upper-triangle partial rows plus
    the D first-moment partials — and one map-side-combined groupBy
    finishes cov(i,j) = E[xi xj] - E[xi]E[xj]. Shuffle volume is
    D(D+1)/2 rows PER PARTITION, independent of N; nothing ever
    collects. Output: (i, j, cov) for i <= j, rounded to TREND_ROUND —
    the DuckDB oracle recomputes the identical formula from a double
    unnest, so the GEMM path is hash-gated like every analytic.
    """
    import numpy as np
    import pandas as pd

    first = embeddings.select(F.size("embedding").alias("d")).first()
    spark = embeddings.sparkSession
    if first is None:
        return spark.createDataFrame([], "i int, j int, cov double")
    dim = int(first["d"])
    iu = np.triu_indices(dim)

    def partials(batches):
        G = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            G += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        yield pd.DataFrame({
            "i": iu[0].astype("int32"),
            "j": iu[1].astype("int32"),
            "sxy": G[iu],
            "sx": s[iu[0]],
            "sy": s[iu[1]],
            "n": np.full(len(iu[0]), n, dtype="int64"),
        })

    parts = embeddings.select("embedding").mapInPandas(
        partials, "i int, j int, sxy double, sx double, sy double, n long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(F.sum("sxy").alias("sxy"), F.sum("sx").alias("sx"),
             F.sum("sy").alias("sy"), F.sum("n").alias("n"))
        .select(
            "i", "j",
            # + 0.0 collapses IEEE negative zero: near-zero covariances
            # round to -0.0 on whichever engine drifted negative, and
            # the driver renders repr() — '-0.0' vs '0.0' flips the hash
            (F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                TREND_ROUND,
            ) + F.lit(0.0)).alias("cov"),
        )
        .orderBy("i", "j")
    )


def dd_embeddings_covariance_sql(table: str = "embeddings") -> str:
    """Oracle twin of :func:`embeddings_covariance`: the same population
    formula from a positional double-unnest (0-based indices to match
    the Spark side)."""
    return f"""
WITH flat AS (
  SELECT i, j,
         embedding[i + 1]::DOUBLE AS vi, embedding[j + 1]::DOUBLE AS vj
  FROM {table},
       unnest(range(0, len(embedding))) a(i),
       unnest(range(0, len(embedding))) b(j)
  WHERE i <= j
)
SELECT i::INT AS i, j::INT AS j,
       round(sum(vi * vj) / count(*)
             - (sum(vi) / count(*)) * (sum(vj) / count(*)),
             {TREND_ROUND}) + 0.0 AS cov
FROM flat GROUP BY i, j ORDER BY i, j
""".strip()
