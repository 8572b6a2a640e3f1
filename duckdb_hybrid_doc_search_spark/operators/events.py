"""Event-stream operators: sessionization, tumbling-window aggregation,
pivot, JSON extraction.

Batch definitions live here (oracle-gated); the Structured Streaming
equivalents (watermark + window) are in streaming/events.py, with tests
asserting stream output == these batch results — Spark's unified batch/
stream semantics make the batch query the specification.

All timestamps are carried as epoch MICROSECOND longs — the one
representation both engines agree on bit-exactly. The generated events
parquet has shipped `ts` both as nanosecond-precision (which Spark reads
as a nanos LONG under session.py's `nanosAsLong`) and as timestamp[us];
``ts_micros`` adapts per schema so every operator sees epoch micros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6h inactivity closes a session
WINDOW_SECONDS = 86_400  # 1-day tumbling windows
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VALUE_ROUND = 6


def ts_micros(events: DataFrame, col: str = "ts") -> Column:
    """Event time as epoch microseconds, whatever the physical encoding.

    - nanos LONG (nanosAsLong read of timestamp[ns] parquet): integer-div
      truncation to micros, exactly DuckDB's ns->us conversion;
    - timestamp / timestamp_ntz: unix_micros under the enforced UTC
      session zone (catalog.ensure_session_conf), matching the UTC-naive
      DuckDB `epoch_us(ts)`.
    """
    dt = dict(events.dtypes).get(col)
    if dt in ("bigint", "long"):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def session_events(events: DataFrame, *extra_cols: str) -> DataFrame:
    """Per-event gap-based session assignment: lag -> new-session flag ->
    running sum as session number. Two window passes over the same
    (user_id, ts) partitioning — one shuffle, reused by both. Shared by
    sessionize / session_paths; `extra_cols` carries additional event
    columns through the windows."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"), "value",
        *extra_cols,
    )
    flagged = e.withColumn(
        "brk",
        F.when(
            F.col("us") - F.lag("us").over(w) > SESSION_GAP_US, 1
        ).otherwise(
            F.when(F.lag("us").over(w).isNull(), 1).otherwise(0)
        ),
    )
    return flagged.withColumn("session_no", F.sum("brk").over(wrun))


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization: per-event session assignment
    (session_events) -> per-session aggregates."""
    return (
        session_events(events).groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
    )


def dd_sessionize_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN lag(us) OVER w IS NULL THEN 1
         WHEN us - lag(us) OVER w > {SESSION_GAP_US} THEN 1
         ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT *, (sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*)::BIGINT AS n_events,
       round(sum(value), {VALUE_ROUND}) AS sum_value,
       min(us) AS start_us, max(us) AS end_us
FROM sess GROUP BY user_id, session_no
""".strip()


def windowed_agg(events: DataFrame) -> DataFrame:
    """1-day tumbling-window counts/sums per event_type (batch form of the
    streaming query in streaming/events.py)."""
    wstart = F.expr(
        f"us div 1000000 div {WINDOW_SECONDS} * {WINDOW_SECONDS}"
    )
    return (
        events.select(
            ts_micros(events).alias("us"), "event_type", "value"
        )
        .groupBy(
            wstart.alias("window_start"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
        )
    )


def dd_windowed_agg_sql() -> str:
    return f"""
SELECT (epoch_us(ts) // 1000000) // {WINDOW_SECONDS} * {WINDOW_SECONDS} AS window_start,
       event_type, count(*)::BIGINT AS n,
       round(sum(value), {VALUE_ROUND}) AS sum_value
FROM events GROUP BY 1, 2
""".strip()


def grouping_sets_rollup(events: DataFrame) -> DataFrame:
    """GROUPING SETS over the events fact — (event_type), (day),
    (event_type, day) in ONE pass: Spark expands the sets map-side and
    partially aggregates before the single shuffle, exactly the shape a
    reporting layer wants instead of three scans + union. NULL in an
    output key column marks the level that aggregated it away."""
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    base = events.select(
        "event_type", day.alias("day"), "value"
    )
    base.createOrReplaceTempView("_ev_gs")
    return base.sparkSession.sql(f"""
        SELECT event_type, day,
               count(*) AS n,
               round(sum(value), {VALUE_ROUND}) AS sum_value
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
        ORDER BY event_type, day
    """)


def dd_grouping_sets_rollup_sql() -> str:
    return f"""
SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       count(*)::BIGINT AS n,
       round(sum(value), {VALUE_ROUND}) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (epoch_us(ts) // 86400000000),
                        (event_type, epoch_us(ts) // 86400000000))
ORDER BY event_type, day
""".strip()


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Per-user event-type counts as columns (pivot with a FIXED value list
    — unbounded pivots don't scale; the set is part of the schema)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


def dd_event_type_pivot_sql() -> str:
    cols = ",\n       ".join(
        f"count(*) FILTER (event_type = '{t}')::BIGINT AS \"{t}\""
        for t in EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id ORDER BY user_id
""".strip()


def asof_click_before_purchase(events: DataFrame) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the most
    recent click by the same user at or before the purchase time.

    Implemented as the union-and-carry pattern: tag both streams, sort by
    (time, tag) inside each user partition — clicks sort before purchases
    at equal timestamps — and carry the last click time forward with a
    running `last(..., ignoreNulls)` window. One shuffle on user_id, no
    range join explosion; equivalent to `pd.merge_asof` per group but
    stays JVM-side.

    Output: user_id, event_id (purchase), purchase_us, last_click_us
    (NULL if no prior click), gap_us.
    """
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"),
        "event_type",
    ).where(F.col("event_type").isin("click", "purchase"))
    tagged = e.withColumn(
        "kind", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_click_us",
        F.last(F.when(F.col("kind") == 0, F.col("us")), ignorenulls=True).over(w),
    )
    return (
        carried.where(F.col("kind") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("us").alias("purchase_us"),
            "last_click_us",
            (F.col("us") - F.col("last_click_us")).alias("gap_us"),
        )
    )


def dd_asof_click_before_purchase_sql() -> str:
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
           FROM events WHERE event_type IN ('click', 'purchase'))
SELECT p.user_id, p.event_id, p.us AS purchase_us,
       (SELECT max(c.us) FROM e c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.us <= p.us) AS last_click_us,
       p.us - (SELECT max(c.us) FROM e c
               WHERE c.event_type = 'click' AND c.user_id = p.user_id
                 AND c.us <= p.us) AS gap_us
FROM e p WHERE p.event_type = 'purchase'
""".strip()


def props_json_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull props.k (JSON) and aggregate."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def props_variant_stats(events: DataFrame) -> DataFrame:
    """Same contract as props_json_stats via Spark 4 VariantType:
    parse_json once, then typed try_variant_get extraction — the modern
    engine path for semi-structured columns (variant binary encoding is
    decoded once per row instead of re-parsing JSON per field access).
    Oracle: identical to the JSON form — the encoding must not change
    the answer."""
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def dd_props_json_stats_sql() -> str:
    return """
SELECT event_type, count(*)::BIGINT AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT) AS min_k,
       max(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""".strip()


def user_lag_deltas(events: DataFrame) -> DataFrame:
    """lead/lag + ntile window surface: per-user inter-event gap and its
    within-user quartile. Bounded partitions (per user), no global sort."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us")
    )
    with_delta = e.withColumn(
        "delta_us", F.col("us") - F.lag("us").over(w)
    ).where(F.col("delta_us").isNotNull())
    wq = Window.partitionBy("user_id").orderBy("delta_us", "event_id")
    return with_delta.withColumn("quartile", F.ntile(4).over(wq)).select(
        "user_id", "event_id", "delta_us", "quartile"
    )


def dd_user_lag_deltas_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
d AS (
  SELECT user_id, event_id,
         us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS delta_us
  FROM e
)
SELECT user_id, event_id, delta_us,
       ntile(4) OVER (PARTITION BY user_id
                      ORDER BY delta_us, event_id)::INT AS quartile
FROM d WHERE delta_us IS NOT NULL
""".strip()


GRANULARITIES = ("hour", "day")


def multi_granularity_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: the same counters at
    several time granularities in one pass — a union of date_trunc
    groupings, each a partial-agg + one shuffle (at scale these become
    incremental materialized rollups; the grouping shape is identical)."""
    ts = F.timestamp_micros(ts_micros(events))
    parts = []
    for g in GRANULARITIES:
        parts.append(
            events.select(
                F.lit(g).alias("granularity"),
                F.unix_micros(F.date_trunc(g, ts)).alias("bucket_us"),
                "event_type",
                "value",
            )
            .groupBy("granularity", "bucket_us", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("granularity", "bucket_us", "event_type")


def dd_multi_granularity_rollup_sql() -> str:
    selects = "\nUNION ALL\n".join(
        f"""SELECT '{g}' AS granularity,
       epoch_us(date_trunc('{g}', make_timestamp(epoch_us(ts)))) AS bucket_us,
       event_type, count(*)::BIGINT AS n,
       round(sum(value), {VALUE_ROUND}) AS sum_value
FROM events GROUP BY granularity, bucket_us, event_type"""
        for g in GRANULARITIES
    )
    return f"""
SELECT * FROM (
{selects}
) ORDER BY granularity, bucket_us, event_type
""".strip()


def approx_distinct_users_error(events: DataFrame) -> DataFrame:
    """Sketch-quality metric (rows-only: Spark HLL++ and DuckDB's HLL are
    different sketches): exact vs approx distinct users + relative error.
    At 100 TB the approx path is the only affordable one; the recorded
    error is what justifies it."""
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    )
    return row.select(
        "exact",
        "approx",
        F.round(
            F.abs(F.col("approx") - F.col("exact")) / F.col("exact"), 6
        ).alias("rel_err"),
    )


def session_event_stats(events: DataFrame) -> DataFrame:
    """Range join events back into their gap-sessions: per session, the
    count and max value of the events inside [start_us, end_us].

    The range predicate rides on the user_id EQUI key, so the plan is an
    ordinary keyed join with the BETWEEN as a post-filter — no interval
    explosion; shuffle is one user_id exchange reused from sessionize.
    (A range join with NO equi key should be binned: equi-join on a
    time-bucket column, then exact-filter — same pattern as IVF cells.)
    """
    sessions = sessionize(events)
    e = events.select(
        F.col("user_id").alias("e_user"),
        ts_micros(events).alias("e_us"),
        "value",
    )
    return (
        sessions.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_us") >= F.col("start_us"))
            & (F.col("e_us") <= F.col("end_us")),
        )
        .groupBy("user_id", "start_us", "end_us", "n_events")
        .agg(
            F.count(F.lit(1)).alias("n_in_range"),
            F.round(F.max("value"), VALUE_ROUND).alias("max_value"),
        )
        .orderBy("user_id", "start_us")
    )


def dd_session_event_stats_sql() -> str:
    return f"""
WITH sess AS ({dd_sessionize_sql()}),
e AS (SELECT user_id AS e_user, epoch_us(ts) AS e_us, value FROM events)
SELECT s.user_id, s.start_us, s.end_us, s.n_events,
       count(*)::BIGINT AS n_in_range,
       round(max(e.value), {VALUE_ROUND}) AS max_value
FROM sess s JOIN e
  ON s.user_id = e.e_user AND e.e_us BETWEEN s.start_us AND s.end_us
GROUP BY s.user_id, s.start_us, s.end_us, s.n_events
ORDER BY s.user_id, s.start_us
""".strip()


def funnel_view_click_purchase(events: DataFrame) -> DataFrame:
    """Funnel analysis: per-user first view -> first subsequent click ->
    first subsequent purchase, reduced to stage conversion counts. One
    shuffle (conditional min-aggregates per user), then a single-row
    reduce — the standard product-analytics shape, scale-bound by
    |users|."""
    e = events.select(
        "user_id", ts_micros(events).alias("us"), "event_type"
    )
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "first_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("n_purchased_after_click"),
    )


def dd_funnel_sql() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT count(CASE WHEN first_view IS NOT NULL THEN 1 END)::BIGINT AS n_viewed,
       count(CASE WHEN first_view IS NOT NULL
                   AND first_click > first_view THEN 1 END)::BIGINT
         AS n_clicked_after_view,
       count(CASE WHEN first_view IS NOT NULL
                   AND first_click > first_view
                   AND first_purchase > first_click THEN 1 END)::BIGINT
         AS n_purchased_after_click
FROM per_user
""".strip()


def props_map_stats(events: DataFrame) -> DataFrame:
    """MAP-typed column surface: parse the JSON props into
    map<string,long>, explode entries, aggregate per key. The map type is
    the schema-flexible path for property bags whose key set drifts —
    exactly what from_json(MapType) is for (a struct schema would need a
    migration per new key).

    Per-key tolerance: values parse as strings first, then try_cast to
    long — a single non-numeric value nulls only ITS entry (counted in n,
    ignored by min/max/sum), instead of from_json(Map<,Long>) nulling the
    whole row's map. Keys containing quotes are outside the contract
    (JSON-path quoting differs across engines)."""
    m = F.from_json(
        "props", T.MapType(T.StringType(), T.StringType())
    )
    return (
        events.select(F.explode(m).alias("key", "sval"))
        .select("key", F.col("sval").try_cast(T.LongType()).alias("val"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.sum("val").alias("sum_val"),
        )
        .orderBy("key")
    )


def dd_props_map_stats_sql() -> str:
    # json_keys + per-key extract (this DuckDB build ships json_extract /
    # json_keys but not the json_each table function). Path is quoted so
    # keys containing dots resolve; TRY_CAST mirrors Spark's try_cast.
    return """
WITH kv AS (
  SELECT key,
         TRY_CAST(json_extract_string(props, '$."' || key || '"') AS BIGINT)
           AS val
  FROM (SELECT props, unnest(json_keys(props)) AS key FROM events)
)
SELECT key, count(*)::BIGINT AS n,
       min(val) AS min_val, max(val) AS max_val, sum(val)::BIGINT AS sum_val
FROM kv GROUP BY key ORDER BY key
""".strip()


def key_skew_stats(orders: DataFrame, key: str = "o_custkey") -> DataFrame:
    """Skew diagnostic: per-key row counts reduced to the numbers that
    decide a salting/AQE strategy — key cardinality, max and mean bucket
    size, and the max/mean skew factor (integer-exact where possible)."""
    per_key = orders.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        F.round(F.avg("c"), 6).alias("avg_key_rows"),
        F.round(
            F.max("c") / (F.sum("c") / F.count(F.lit(1))), 6
        ).alias("skew_factor"),
    )


def dd_key_skew_stats_sql(key: str = "o_custkey") -> str:
    return f"""
WITH per_key AS (
  SELECT {key}, count(*)::BIGINT AS c FROM orders GROUP BY {key}
)
SELECT count(*)::BIGINT AS n_keys, sum(c)::BIGINT AS n_rows,
       max(c)::BIGINT AS max_key_rows,
       round(avg(c), 6) AS avg_key_rows,
       round(max(c) / (sum(c) * 1.0 / count(*)), 6) AS skew_factor
FROM per_key
""".strip()


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by the month of their FIRST
    event; for each (cohort_month, month_offset), the count of cohort
    members active that month — the standard product-retention rollup.
    Months are integer-encoded (year*12+month) so the offset arithmetic
    is exact on both engines. Two aggregations on user_id: the cohort min
    and the distinct activity months; the matrix join is on the tiny
    per-user tables, not raw events."""
    m = (F.year(F.col("tse")) * 12 + F.month(F.col("tse"))).alias("ym")
    e = events.select(
        "user_id",
        F.timestamp_micros(ts_micros(events)).alias("tse"),
    ).select("user_id", m)
    cohorts = e.groupBy("user_id").agg(F.min("ym").alias("cohort_ym"))
    activity = e.distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_ym",
            (F.col("ym") - F.col("cohort_ym")).alias("month_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_ym", "month_offset")
    )


def dd_retention_cohorts_sql() -> str:
    return """
WITH e AS (
  SELECT user_id,
         (EXTRACT(year FROM ts) * 12 + EXTRACT(month FROM ts))::BIGINT AS ym
  FROM events
),
cohorts AS (SELECT user_id, min(ym) AS cohort_ym FROM e GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, ym FROM e)
SELECT c.cohort_ym, (a.ym - c.cohort_ym) AS month_offset,
       count(DISTINCT a.user_id)::BIGINT AS n_active
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY c.cohort_ym, month_offset
ORDER BY c.cohort_ym, month_offset
""".strip()


def gap_fill_locf(events: DataFrame) -> DataFrame:
    """Time-series gap filling: densify each event_type's daily value
    series over its own [first, last] day range and carry the last
    observed value forward across missing days (LOCF).

    Scale shape: the grid generation is a per-group sequence explode off
    the tiny bounds table (|event_types| rows), the join back to observed
    days is keyed (event_type, day), and the carry-forward is a per-group
    ordered window — partitions bounded by one type's day span, no global
    order anywhere.

    Output: event_type, day (epoch days), sum_value (NULL until first
    observation), filled_value (LOCF), observed flag.
    """
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    daily = (
        events.select("event_type", day.alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
    )
    joined = grid.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "day",
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("sum_value").isNotNull().alias("observed"),
    ).orderBy("event_type", "day")


def dd_gap_fill_locf_sql() -> str:
    return f"""
WITH daily AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
         round(sum(value), {VALUE_ROUND}) AS sum_value
  FROM events GROUP BY event_type, day
),
bounds AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi
  FROM daily GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS day FROM bounds
)
SELECT g.event_type, g.day, d.sum_value,
       last_value(d.sum_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS UNBOUNDED PRECEDING) AS filled_value,
       d.sum_value IS NOT NULL AS observed
FROM grid g LEFT JOIN daily d
  ON g.event_type = d.event_type AND g.day = d.day
ORDER BY g.event_type, g.day
""".strip()


def gap_fill_interpolate(events: DataFrame) -> DataFrame:
    """Linear interpolation across missing days (the numeric sibling of
    LOCF): for each gap day, lerp between the previous and next observed
    daily sums; edges (before first / after last observation in a type's
    range) stay NULL. Same per-group grid/window shape as gap_fill_locf —
    two extra carried columns, still no global order.

    Output: event_type, day, sum_value, interp_value, observed.
    """
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    daily = (
        events.select("event_type", day.alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
    )
    j = grid.join(daily, ["event_type", "day"], "left")
    wb = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("sum_value").isNotNull(), F.col("day"))
    j = (
        j.withColumn("pv", F.last("sum_value", ignorenulls=True).over(wb))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("sum_value", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(wf))
    )
    interp = F.when(F.col("sum_value").isNotNull(), F.col("sum_value")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("day") - F.col("pd"))
            / (F.col("nd") - F.col("pd")),
        )
    )
    return j.select(
        "event_type",
        "day",
        "sum_value",
        F.round(interp, VALUE_ROUND).alias("interp_value"),
        F.col("sum_value").isNotNull().alias("observed"),
    ).orderBy("event_type", "day")


def dd_gap_fill_interpolate_sql() -> str:
    return f"""
WITH daily AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) AS day,
         round(sum(value), {VALUE_ROUND}) AS sum_value
  FROM events GROUP BY event_type, day
),
bounds AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi
  FROM daily GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS day FROM bounds
),
j AS (
  SELECT g.event_type, g.day, d.sum_value,
         last_value(d.sum_value IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN d.sum_value IS NOT NULL THEN g.day END
                    IGNORE NULLS) OVER wb AS pd,
         first_value(d.sum_value IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN d.sum_value IS NOT NULL THEN g.day END
                     IGNORE NULLS) OVER wf AS nd
  FROM grid g LEFT JOIN daily d
    ON g.event_type = d.event_type AND g.day = d.day
  WINDOW wb AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day, sum_value,
       round(CASE WHEN sum_value IS NOT NULL THEN sum_value
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * (day - pd) / (nd - pd)
             END, {VALUE_ROUND}) AS interp_value,
       sum_value IS NOT NULL AS observed
FROM j
ORDER BY event_type, day
""".strip()


MAD_K = 3.0


def daily_anomaly_mad(events: DataFrame) -> DataFrame:
    """Robust anomaly days: flag days whose total value deviates from the
    corpus median by more than MAD_K times the median absolute deviation.
    Two tiny exact-percentile reductions over the DAILY table (bounded by
    the day count, not the event count) — the event-scale work is one
    groupBy. Output: day, total, deviation, is_anomaly (anomalies only).
    """
    day = (ts_micros(events) / F.lit(86_400_000_000)).cast("long")
    daily = (
        events.select(day.alias("day"), "value")
        .groupBy("day")
        .agg(F.round(F.sum("value"), VALUE_ROUND).alias("total"))
    )
    med = daily.agg(
        F.expr("percentile(total, 0.5)").alias("med")
    )
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "adev", F.abs(F.col("total") - F.col("med"))
    )
    mad = dev.agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .where(F.col("adev") > F.lit(MAD_K) * F.col("mad"))
        .select(
            "day",
            "total",
            F.round(F.col("adev"), VALUE_ROUND).alias("deviation"),
        )
        .orderBy("day")
    )


def dd_daily_anomaly_mad_sql() -> str:
    return f"""
WITH daily AS (
  SELECT (epoch_us(ts) // 86400000000) AS day,
         round(sum(value), {VALUE_ROUND}) AS total
  FROM events GROUP BY day
),
med AS (SELECT quantile_cont(total, 0.5) AS med FROM daily),
dev AS (
  SELECT day, total, abs(total - med) AS adev FROM daily CROSS JOIN med
),
mad AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
SELECT day, total, round(adev, {VALUE_ROUND}) AS deviation
FROM dev CROSS JOIN mad
WHERE adev > {MAD_K} * mad
ORDER BY day
""".strip()


def type_transition_matrix(events: DataFrame) -> DataFrame:
    """Markov-style transition counts: for each user's time-ordered event
    stream, count consecutive (from_type -> to_type) pairs, with each
    row's share of its from_type's outgoing transitions. One lag window
    per user partition + one pair aggregation — the sequence-analytics
    shape (next-event prediction features, funnel sanity checks)."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"), "event_type"
    )
    pairs = (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("share"),
    ).orderBy("from_type", "to_type")


def dd_type_transition_matrix_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
),
pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
           ORDER BY us, event_id) AS from_type,
         event_type AS to_type
  FROM e
),
counts AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS share
FROM counts
ORDER BY from_type, to_type
""".strip()


def audience_overlap(events: DataFrame) -> DataFrame:
    """Pairwise audience overlap between event types: for each unordered
    type pair, the distinct-user intersection, per-type audience sizes,
    and Jaccard — the cross-sell / co-engagement matrix.

    Scale shape: one distinct over (type, user), one self-equi-join on
    user_id (per-user fan-out bounded by |EVENT_TYPES|² pairs), and the
    per-type sizes broadcast back — never a users×users product.
    """
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a, b = tu.alias("a"), tu.alias("b")
    both = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                VALUE_ROUND,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def dd_audience_overlap_sql() -> str:
    return f"""
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (
  SELECT event_type, count(*)::BIGINT AS n_users FROM tu GROUP BY event_type
),
ovl AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_both,
       round(n_both * 1.0 / (sa.n_users + sb.n_users - n_both),
             {VALUE_ROUND}) AS jaccard
FROM ovl
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
ORDER BY type_a, type_b
""".strip()


def hll_distinct_error(events: DataFrame,
                       rsd: float = 0.05) -> DataFrame:
    """Sketch-quality metric for the distinct-count path (rows-only: the
    HLL++ sketch is engine-internal): per event_type exact distinct users
    vs approx_count_distinct at the given rsd, with relative error — the
    recorded evidence for swapping exact COUNT(DISTINCT) (a full shuffle
    of the key space) for the mergeable sketch at 100 TB, the same
    pattern text_countmin_error pins for frequency estimates."""
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd).alias("estimate"),
        )
        .select(
            "event_type", "exact", "estimate",
            F.round(
                F.abs(F.col("estimate") - F.col("exact")) / F.col("exact"),
                VALUE_ROUND,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def session_stats_distribution(events: DataFrame) -> DataFrame:
    """Session-shape profile: sessions bucketed by power-of-two event
    count, with per-bucket session counts and duration stats — the
    distribution view a product team reads off the sessionizer.

    Derives from sessionize() (per-user windows), then one tiny grouped
    aggregate; duration sums stay integral (epoch-micro int64) so the
    averages are exact cross-engine.
    """
    sess = sessionize(events)
    bucket = F.floor(F.log2(F.col("n_events").cast("double"))).cast("long")
    dur = F.col("end_us") - F.col("start_us")
    return (
        sess.select(bucket.alias("log2_events"), dur.alias("dur_us"))
        .groupBy("log2_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            # exact int64 sum, ONE double division (engine avg() over
            # int64 differs in accumulator type across engines once the
            # sum passes 2^53; sum-then-divide is bit-identical)
            F.round(
                F.sum("dur_us").cast("double")
                / F.count(F.lit(1)).cast("double"),
                VALUE_ROUND,
            ).alias("avg_dur_us"),
            F.max("dur_us").alias("max_dur_us"),
        )
        .orderBy("log2_events")
    )


def dd_session_stats_distribution_sql() -> str:
    return f"""
WITH sess_agg AS ({dd_sessionize_sql()})
SELECT floor(log2(n_events::DOUBLE))::BIGINT AS log2_events,
       count(*)::BIGINT AS n_sessions,
       round(sum(end_us - start_us)::DOUBLE / count(*)::DOUBLE,
             {VALUE_ROUND}) AS avg_dur_us,
       max(end_us - start_us) AS max_dur_us
FROM sess_agg GROUP BY log2_events ORDER BY log2_events
""".strip()


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """CDC-style last-write-wins compaction: each user's most recent
    event (ties on timestamp broken by highest event_id — the arrival
    order surrogate). The standard upsert-materialization shape: one
    per-user window, partitions bounded by a user's history; at scale
    this is the compaction step of a changelog -> snapshot pipeline.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"),
        "event_type", "value",
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "us", "event_type",
                F.round("value", VALUE_ROUND).alias("value"))
        .orderBy("user_id")
    )


def dd_latest_event_per_user_sql() -> str:
    return f"""
SELECT user_id, event_id, us, event_type, round(value, {VALUE_ROUND}) AS value
FROM (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
""".strip()


# --- session path mining ----------------------------------------------------

PATHS_TOP = 20


def session_paths(events: DataFrame) -> DataFrame:
    """Top user journeys: the most frequent per-session event-type paths
    ('a>b>c', events in time order), with session count and mean length.

    Plan shape: the shared session_events windows (partitioned per user)
    -> per-session collect_list of (us, event_id, event_type) structs,
    sorted in-task by array_sort (a session's events — bounded by the
    gap rule — never a global sort) -> hash aggregate on the path
    string -> TakeOrderedAndProject for the top-N. The path count
    shuffle is keyed on the path string; skew there is bounded by the
    top paths themselves, which AQE splits if one dominates.
    """
    sess = session_events(events, "event_type")
    per_session = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("us", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), VALUE_ROUND).alias("avg_len"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATHS_TOP)
    )


def dd_session_paths_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN lag(us) OVER w IS NULL THEN 1
         WHEN us - lag(us) OVER w > {SESSION_GAP_US} THEN 1
         ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT *, (sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_no
  FROM flagged
),
per_session AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path,
         count(*)::BIGINT AS n_events
  FROM sess GROUP BY user_id, session_no
)
SELECT path, count(*)::BIGINT AS n_sessions,
       round(avg(n_events), {VALUE_ROUND}) AS avg_len
FROM per_session GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATHS_TOP}
""".strip()
