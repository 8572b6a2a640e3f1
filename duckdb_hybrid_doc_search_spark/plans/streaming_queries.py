"""Streaming twins as registered queries (bench=False).

Each callable drives the bounded file-stream to completion
(processAllAvailable over the sf_dir events parquet) and returns the
final result DataFrame — so the streaming surface is part of the same
driver contract as everything else, INCLUDING the DuckDB hash gate:
on a bounded source the final streaming state equals the batch result,
so each twin carries the batch oracle (windowed agg = the batch agg;
CDC upsert = the compacted emission log; sessionizer = every session
except each user's still-open last one). tests/test_streaming.py
additionally pins stream==batch equality on the RocksDB provider.
Excluded from the bench loop (a bounded drive measures orchestration,
not engine throughput — tools/stream_bench.py records that number).

Deliberately registered WITHOUT defer_gate (unlike other mid-round
additions): converting the streaming surface from rows-only to
hash-gated THIS round is the r4 verdict's explicit ask, and the window
math holds — ~31 oracled priorities + ~19 rows-only still fit the
driver's ~50-row window with the >=5 rows-only quota intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as _dedup
from ..operators import events as _events
from ..operators import knn as _knn
from ..streaming import events as _streaming
from ..streaming import ingest as _ingest
from .registry import register


@register("streaming_windowed_agg", bench=False, executes_on_build=True,
          oracle=_events.dd_windowed_agg_sql())
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg driven to completion (twin of
    events_windowed_agg; complete-mode final table == the batch agg)."""
    from ..streaming.events import run_streaming_windowed_agg

    return run_streaming_windowed_agg(spark, sf_dir, "reg_ev_win")


@register("streaming_sessionize", bench=False, executes_on_build=True,
          oracle=_streaming.dd_closed_sessions_sql())
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState gap sessionizer driven to completion (twin
    of events_sessionization restricted to CLOSED sessions — every
    session except each user's still-open last one)."""
    from ..streaming.events import run_streaming_sessionize

    return run_streaming_sessionize(spark, sf_dir, "reg_ev_sess")


@register("streaming_latest_per_user", bench=False, executes_on_build=True,
          oracle=_events.dd_latest_event_per_user_sql())
def streaming_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful CDC upsert snapshot driven to completion (twin of
    events_latest_per_user). run_streaming_latest_per_user already
    compacts the append-mode emission log to one row per user (per-user
    max (us, event_id) — emissions are monotone, so the compaction is
    batch-count independent); this wrapper only aligns the value
    rounding and ordering with the batch oracle."""
    from ..operators.events import VALUE_ROUND
    from ..streaming.events import run_streaming_latest_per_user

    snap = run_streaming_latest_per_user(spark, sf_dir, "reg_ev_latest")
    return snap.select(
        "user_id", "event_id", "us", "event_type",
        F.round("value", VALUE_ROUND).alias("value"),
    ).orderBy("user_id")


@register("streaming_dedup", bench=False, executes_on_build=True,
          oracle="""
SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
FROM events
""".strip())
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked exactly-once intake driven to completion. The events
    table's ids are unique, so dedup is the identity projection — the
    oracle checks the stateful path neither drops nor duplicates rows;
    replay-duplicate behavior is pinned separately in
    tests/test_streaming.py, and throughput in STREAMBENCH."""
    from ..streaming.events import run_streaming_dedup

    return run_streaming_dedup(spark, sf_dir, "reg_ev_dedup")


@register("streaming_doc_dedup", bench=False, executes_on_build=True,
          oracle="""
SELECT md5(text) AS fp, count(*)::BIGINT AS cnt,
       min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
""".strip())
def streaming_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-ingestion dedup as a streaming aggregation: the state
    store (fp -> cnt, keep_id) IS the persistent fingerprint index an
    ingestion pipeline maintains; final state hash-matches the batch
    dedup_exact oracle."""
    from ..streaming.docs import run_streaming_doc_dedup

    return run_streaming_doc_dedup(spark, sf_dir, "reg_doc_dedup")


@register("streaming_incremental_dedup", bench=False,
          executes_on_build=True,
          oracle=_dedup.dd_dedup_incremental_batch_sql())
def streaming_incremental_dedup(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The full ingestion-dedup LOOP as a structured stream: each
    foreachBatch slice is decided against the written signature store
    (exact + LSH near tiers), then the kept docs' signatures append to
    the store for the next shard. The bounded drive's accumulated
    decisions hash-match the batch dedup_incremental_batch oracle —
    a fully oracled streaming row, like streaming_doc_dedup."""
    from ..streaming.docs import run_streaming_incremental_dedup

    return run_streaming_incremental_dedup(spark, sf_dir, "reg_inc_dedup")


@register("streaming_enrich_join", bench=False, executes_on_build=True,
          oracle="""
WITH dim(event_type, category, weight) AS (
  VALUES ('click', 'engagement', 1.0::DOUBLE),
         ('view', 'engagement', 0.5::DOUBLE),
         ('purchase', 'revenue', 10.0::DOUBLE),
         ('signup', 'growth', 5.0::DOUBLE),
         ('error', 'ops', 0.0::DOUBLE)
)
SELECT e.event_id, e.user_id, e.event_type, d.category, d.weight,
       e.value * d.weight AS weighted_value
FROM events e JOIN dim d USING (event_type)
""".strip())
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join driven to completion — the third
    canonical streaming join mode next to stream-stream interval join
    and stateful ops: each micro-batch broadcast-joins the static
    event-type dimension (streaming/events.event_type_dim), no state or
    watermark needed. The oracle is the identical batch join with the
    dim inlined as VALUES."""
    from ..streaming.events import run_streaming_enrich

    return run_streaming_enrich(spark, sf_dir, "reg_ev_enrich")


@register("streaming_distinct_users", bench=False, executes_on_build=True,
          oracle="""
SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
       count(DISTINCT user_id)::BIGINT AS n_active_1d
FROM events GROUP BY 1
""".strip())
def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed COUNT DISTINCT driven to completion: watermarked
    dropDuplicates on (window, user_id) then a mergeable count — the
    canonical two-stage shape for non-mergeable aggregates in streams.
    Complete-mode final table == the batch daily distinct count."""
    from ..streaming.events import run_streaming_windowed_distinct_users

    return run_streaming_windowed_distinct_users(spark, sf_dir,
                                                 "reg_ev_dau")


@register("streaming_funnel", bench=False, executes_on_build=True,
          oracle="""
SELECT user_id,
       min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
         ::BIGINT AS first_view,
       min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
         ::BIGINT AS first_click,
       min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         ::BIGINT AS first_purchase
FROM events
WHERE event_type IN ('view', 'click', 'purchase')
GROUP BY user_id
""".strip())
def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style stateful funnel (applyInPandasWithState per-user
    earliest view/click/purchase) driven to completion; emissions are
    monotone improvements, so the column-wise min per user equals the
    batch min-aggregate over tracked events."""
    from ..streaming.events import run_streaming_funnel_stages

    return run_streaming_funnel_stages(spark, sf_dir, "reg_ev_funnel")


@register("streaming_interval_join", bench=False, executes_on_build=True,
          oracle="""
WITH c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, p.purchase_id,
       (p.p_us - c.c_us)::BIGINT AS gap_us
FROM c JOIN p ON c.user_id = p.user_id
              AND p.p_us >= c.c_us
              AND p.p_us <= c.c_us + 86400000000
""".strip())
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join driven to completion: the
    event stream split into click/purchase sides, every (click,
    purchase) pair within 1 day joined with both-direction event-time
    bounds so join state expires. Oracle = the identical batch range
    join (86400000000 us = streaming/events.INTERVAL_JOIN_BOUND_US)."""
    from ..streaming.events import run_streaming_interval_join

    q = run_streaming_interval_join(spark, sf_dir, "reg_ev_ivjoin")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM reg_ev_ivjoin")


@register("streaming_asof_join", bench=False, executes_on_build=True,
          oracle=_events.dd_asof_click_before_purchase_sql())
def streaming_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful as-of join driven to completion: one carried value per
    user (latest click), each purchase emits immediately with it — the
    semantics a stream-stream interval join cannot express (latest, not
    all-in-range). Oracle = the batch as-of spec."""
    from ..streaming.events import run_streaming_asof_click_purchase

    return run_streaming_asof_click_purchase(spark, sf_dir, "reg_ev_asof")


def _bm25_oracle():
    from ..operators.bm25 import dd_bm25_topk_sql
    from .doc_search_queries import QTERMS, TOP_K

    return dd_bm25_topk_sql(QTERMS, TOP_K)


@register("streaming_fts_segment_append", bench=False,
          executes_on_build=True,
          oracle=_bm25_oracle())
def streaming_fts_segment_append(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Search-index maintenance as a structured stream over the
    SEGMENTED FTS store: each micro-batch appends one segment (keyed by
    the micro-batch id — redelivery-idempotent), nothing existing is
    recomputed or rewritten, and the post-stream BM25 probe must
    hash-match the FULL-CORPUS bm25_topk oracle. The streaming twin of
    bm25_incremental_layout_probe, and the no-rebuild counterpart of
    streaming_index_update's re-convergence."""
    from ..streaming.index_maintenance import run_streaming_fts_append
    from .doc_search_queries import QUERY, TOP_K

    return run_streaming_fts_append(spark, sf_dir, QUERY, TOP_K,
                                    "reg_fts_append")


@register("streaming_ingest_pipeline", bench=False,
          executes_on_build=True,
          oracle=_ingest.dd_ingest_ledger_sql())
def streaming_ingest_pipeline(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The COMPOSED ingestion loop — dedup-decide, quality gate, FTS
    segment append, signature append — as one structured stream over
    the written layouts; returns the per-batch ledger. The bounded
    drive delivers one micro-batch, so the ledger is one row whose
    counts hash-match the DuckDB composition of the incremental-dedup
    oracle with the quality-floor oracle (streaming/ingest.py)."""
    from ..streaming.ingest import run_streaming_ingest

    return run_streaming_ingest(spark, sf_dir, "reg_ingest")


@register("streaming_ivf_append", bench=False,
          executes_on_build=True,
          oracle=_knn.dd_ivf_topk_sql(5, 10))
def streaming_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index maintenance as a structured stream: each micro-batch
    of arriving vectors is assigned against the layout's FROZEN
    centroids and appended to its cell partitions (new parquet files in
    the hot cells — nothing rebuilt, skip_existing for redelivery). The
    post-stream partition-pruned probe must hash-match the one-shot IVF
    oracle over the FULL table — the streaming twin of
    ann_ivf_append_probe, completing the maintenance-loop pair: FTS
    (streaming_fts_segment_append) and vectors both stay fresh without
    recomputation."""
    from ..streaming.index_maintenance import run_streaming_ivf_append

    return run_streaming_ivf_append(spark, sf_dir, 5, 10, "reg_ivf_append")
