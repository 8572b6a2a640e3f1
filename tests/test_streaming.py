"""Structured Streaming windowed agg must equal its batch specification."""

from __future__ import annotations

import os

import pytest

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators.events import windowed_agg
from duckdb_hybrid_doc_search_spark.streaming.events import (
    run_streaming_windowed_agg,
)


def test_streaming_sessionize_matches_batch_closed_sessions(spark, sf_dir):
    """applyInPandasWithState sessionizer == batch spec for every CLOSED
    session (the last open session per user stays in state)."""
    from duckdb_hybrid_doc_search_spark.operators.events import sessionize
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_sessionize,
    )

    batch_rows = sessionize(load_table(spark, sf_dir, "events")).collect()
    # drop each user's LAST session (still open in the streaming state)
    last_start = {}
    for r in batch_rows:
        last_start[r.user_id] = max(
            last_start.get(r.user_id, -1), r.start_us
        )
    batch_closed = {
        (r.user_id, r.n_events, r.sum_value, r.start_us, r.end_us)
        for r in batch_rows
        if r.start_us != last_start[r.user_id]
    }
    stream_rows = run_streaming_sessionize(spark, sf_dir).collect()
    stream_set = {
        (r.user_id, r.n_events, r.sum_value, r.start_us, r.end_us)
        for r in stream_rows
    }
    assert stream_set == batch_closed
    assert len(stream_set) > 0


def test_streaming_dedup_exactly_once(spark, sf_dir, tmp_path):
    """Replayed input (every event file twice) -> each event_id exactly once."""
    import shutil

    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_dedup,
    )

    src = tmp_path / "replayed"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "events_replay.parquet")
    # point the bounded stream at the replayed dir (glob matches both files)
    import duckdb_hybrid_doc_search_spark.streaming.events as se

    orig = se.read_events_stream

    def patched(spark_, sf_dir_):
        schema = spark_.read.parquet(str(src / "events.parquet")).schema
        return (
            spark_.readStream.schema(schema).format("parquet")
            .option("pathGlobFilter", "*.parquet").load(str(src))
        )

    se.read_events_stream = patched
    try:
        out = run_streaming_dedup(spark, str(src), query_name="ev_dedup_t")
        n_unique = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert out.count() == n_unique
        assert out.select("event_id").distinct().count() == n_unique
    finally:
        se.read_events_stream = orig


def test_streaming_windowed_agg_matches_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in windowed_agg(load_table(spark, sf_dir, "events")).collect()
    }
    stream = {
        tuple(r) for r in run_streaming_windowed_agg(spark, sf_dir).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_streaming_asof_matches_batch(spark, sf_dir):
    """Stateful as-of twin == batch spec EXACTLY (purchases emit
    immediately, so unlike the sessionizer nothing is held back)."""
    from duckdb_hybrid_doc_search_spark.operators.events import (
        asof_click_before_purchase,
    )
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_asof_click_purchase,
    )

    batch = {
        tuple(r)
        for r in asof_click_before_purchase(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    stream = {
        tuple(r)
        for r in run_streaming_asof_click_purchase(spark, sf_dir).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_foreach_batch_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch idempotent parquet sink: the written table holds each
    event exactly once, equal to the batch distinct set."""
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_foreach_batch_parquet,
    )

    out = str(tmp_path / "fb_out")
    run_streaming_foreach_batch_parquet(spark, sf_dir, out)
    written = spark.read.parquet(out)
    n_unique = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").distinct().count()
    )
    assert written.count() == n_unique
    assert written.select("event_id").distinct().count() == n_unique


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Watermarked stream-stream interval join produces exactly the batch
    join's pairs (batch is the specification)."""
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.events import ts_micros
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        interval_join_clicks_purchases, run_streaming_interval_join)

    events = load_table(spark, sf_dir, "events")
    with_ts = events.withColumn("tse", F.timestamp_micros(ts_micros(events)))
    batch = interval_join_clicks_purchases(
        with_ts.where(F.col("event_type") == "click"),
        with_ts.where(F.col("event_type") == "purchase"),
    )
    want = sorted(tuple(r) for r in batch.collect())

    q = run_streaming_interval_join(spark, sf_dir, "ivj_out")
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM ivj_out").collect()
        )
    finally:
        q.stop()
    assert got == want and len(got) > 0


def test_streaming_distinct_users_matches_batch(spark, sf_dir):
    """Streaming dedup+count per window == batch daily distinct actives."""
    from duckdb_hybrid_doc_search_spark.operators.analytics import (
        events_rolling_active_users,
    )
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_windowed_distinct_users,
    )

    got = {
        r["day"]: r["n_active_1d"]
        for r in run_streaming_windowed_distinct_users(spark, sf_dir).collect()
    }
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["day"]: r["n_active_1d"]
        for r in events_rolling_active_users(batch).collect()
    }
    assert got == want


def test_streaming_funnel_matches_batch_mins(spark, sf_dir):
    """Stateful streaming funnel state == the batch per-user first-event
    mins that feed funnel_view_click_purchase."""
    import pyspark.sql.functions as F

    from duckdb_hybrid_doc_search_spark.operators.events import ts_micros
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_funnel_stages,
    )

    got = {
        r["user_id"]: (r["first_view"], r["first_click"], r["first_purchase"])
        for r in run_streaming_funnel_stages(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select("user_id", ts_micros(ev).alias("us"), "event_type")
    want_df = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias("fc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "fp"
        ),
    )
    want = {
        r["user_id"]: (r["fv"], r["fc"], r["fp"])
        for r in want_df.collect()
        if not (r["fv"] is None and r["fc"] is None and r["fp"] is None)
    }
    assert got == want


def test_streaming_static_enrichment_equals_batch(spark, sf_dir):
    """Stream-static broadcast join == the same expression in batch."""
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        event_type_dim,
        run_streaming_enrich,
        streaming_enrich_with_static_dim,
    )

    got = {
        r["event_id"]: (r["category"], round(r["weighted_value"], 9))
        for r in run_streaming_enrich(spark, sf_dir).collect()
    }
    batch = streaming_enrich_with_static_dim(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        event_type_dim(spark),
    )
    want = {
        r["event_id"]: (r["category"], round(r["weighted_value"], 9))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_latest_per_user_matches_batch(spark, sf_dir):
    """Stateful streaming CDC upsert snapshot == the batch last-write-wins
    compaction (events_latest_per_user) — changelog folding equivalence."""
    from duckdb_hybrid_doc_search_spark.operators.events import (
        latest_event_per_user,
    )
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_latest_per_user,
    )

    got = {
        r["user_id"]: (r["event_id"], r["us"], r["event_type"],
                       round(r["value"], 6))
        for r in run_streaming_latest_per_user(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["user_id"]: (r["event_id"], r["us"], r["event_type"],
                       round(r["value"], 6))
        for r in latest_event_per_user(ev).collect()
    }
    assert got == want


def test_streaming_stateful_on_rocksdb_state_store(spark, sf_dir):
    """The stateful CDC upsert runs unchanged on the RocksDB state store
    provider (the production-scale backend: state spills to disk instead
    of living on the JVM heap) and still equals the batch compaction."""
    from duckdb_hybrid_doc_search_spark.operators.events import (
        latest_event_per_user,
    )
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_latest_per_user,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = {
            r["user_id"]: (r["event_id"], r["us"])
            for r in run_streaming_latest_per_user(
                spark, sf_dir, query_name="ev_latest_rocks"
            ).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["user_id"]: (r["event_id"], r["us"])
        for r in latest_event_per_user(ev).collect()
    }
    assert got == want


def test_streaming_doc_dedup_matches_batch(spark, sf_dir):
    """The streaming-aggregation fingerprint state == batch dedup_exact:
    the ingestion-time dedup store is provably the same keep-set the
    batch pipeline computes."""
    from duckdb_hybrid_doc_search_spark.operators.dedup import dedup_exact
    from duckdb_hybrid_doc_search_spark.streaming.docs import (
        run_streaming_doc_dedup,
    )

    batch = {
        (r.fp, r.cnt, r.keep_id)
        for r in dedup_exact(load_table(spark, sf_dir, "documents")).collect()
    }
    stream = {
        (r.fp, r.cnt, r.keep_id)
        for r in run_streaming_doc_dedup(spark, sf_dir, "t_doc_dedup")
        .collect()
    }
    assert stream == batch
    assert len(stream) > 0


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir):
    """The foreachBatch ingestion loop's accumulated decisions == the
    batch incremental-dedup operator (the store starts as the existing
    side's build; the single bounded micro-batch carries the whole
    arriving batch, so within-batch keep-min semantics align)."""
    from duckdb_hybrid_doc_search_spark.operators.dedup import (
        dedup_incremental_batch,
    )
    from duckdb_hybrid_doc_search_spark.streaming.docs import (
        run_streaming_incremental_dedup,
    )

    batch = {
        tuple(r)
        for r in dedup_incremental_batch(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    stream = {
        tuple(r)
        for r in run_streaming_incremental_dedup(
            spark, sf_dir, "t_inc_dedup"
        ).collect()
    }
    assert stream == batch
    assert len(stream) > 0


def test_incremental_dedup_multi_shard_loop(spark, sf_dir, tmp_path):
    """The decide -> append -> repeat loop across SHARDS: a shard-2 doc
    duplicating a shard-1 KEPT doc must come back exact_dup via the
    STORE (the earlier shard's append made it visible), not via
    within-shard keep-min."""
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.index.dedup_layout import (
        append_dedup_signatures, write_dedup_signatures,
    )
    from duckdb_hybrid_doc_search_spark.operators.dedup import (
        BATCH_MOD, decide_batch_against_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") % BATCH_MOD != 0)
    store = str(tmp_path / "store")
    write_dedup_signatures(existing, store)

    batch = docs.where(F.col("doc_id") % BATCH_MOD == 0)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    shard1 = batch.limit(4)
    d1 = {r["doc_id"]: r["decision"]
          for r in decide_batch_against_store(spark, shard1, store)
          .collect()}
    kept1 = sorted(i for i, dec in d1.items() if dec == "kept")
    assert kept1, "shard 1 must keep something for the loop to mean anything"
    append_dedup_signatures(
        spark, store, shard1.where(F.col("doc_id").isin(kept1))
    )
    # shard 2 = verbatim copies of shard-1 KEPT docs under fresh ids
    shift = ((max_id // BATCH_MOD) + 1) * BATCH_MOD
    shard2 = (
        shard1.where(F.col("doc_id").isin(kept1))
        .withColumn("doc_id", F.col("doc_id") + F.lit(shift))
    )
    d2 = {r["doc_id"]: r["decision"]
          for r in decide_batch_against_store(spark, shard2, store)
          .collect()}
    assert all(dec == "exact_dup" for dec in d2.values()), d2
    assert len(d2) == len(kept1)


def test_streaming_fts_append_equals_batch_bm25(spark, sf_dir):
    """The streaming segment-append loop's post-stream probe must equal
    the one-shot batch BM25 over the FULL corpus — appends across the
    stream cannot drift df/n_docs/avgdl (exact-integer segment deltas)."""
    from duckdb_hybrid_doc_search_spark.operators.bm25 import bm25_topk
    from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
        run_streaming_fts_append)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    query = "spark vector join fast merge"
    got = [tuple(r) for r in
           run_streaming_fts_append(spark, sf_dir, query, 10).collect()]
    want = [tuple(r) for r in bm25_topk(docs, query, 10).collect()]
    assert got == want


def test_streaming_fts_append_with_fold_cadence(spark, sf_dir, tmp_path):
    """The fold-cadence loop (fold back to one base segment whenever the
    store reaches fold_every segments) must (a) still probe equal to the
    one-shot batch BM25 over the full corpus, (b) actually fold — the
    post-run store holds ≤ fold_every segments and, when the last batch
    triggered a fold, the fold-time postings_scored table — and (c) stay
    redelivery-safe ACROSS the fold: re-appending an already-folded
    batch with skip_existing is a no-op, without it a loud error."""
    from duckdb_hybrid_doc_search_spark.index.fts_layout import (
        SEG_SCORED, SEG_SPLIT_MOD, SEG_SPLIT_REM, append_fts_segment)
    from duckdb_hybrid_doc_search_spark.operators.bm25 import (
        bm25_topk, bm25_topk_from_index, segment_fts_index)
    from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
        run_streaming_fts_append)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    query = "spark vector join fast merge"
    run_root = str(tmp_path / "foldrun")
    got = [tuple(r) for r in
           run_streaming_fts_append(spark, sf_dir, query, 10,
                                    query_name="fts_append_fold",
                                    fold_every=2, trigger_files=3,
                                    run_root=run_root).collect()]
    want = [tuple(r) for r in bm25_topk(docs, query, 10).collect()]
    assert got == want

    store = f"{run_root}/store"
    n_segs = spark.read.parquet(f"{store}/segstats").count()
    assert n_segs <= 2  # every batch folds at the 2-segment threshold
    assert os.path.exists(f"{store}/{SEG_SCORED}") == (n_segs == 1)

    # redelivery of an already-folded batch: skip_existing reduces it to
    # a no-op (probe unchanged), the loud default raises
    folded_slice = docs.where(
        F.col("doc_id") % SEG_SPLIT_MOD == SEG_SPLIT_REM)
    append_fts_segment(spark, store, folded_slice, append_id="mb0",
                       skip_existing=True)
    again = [tuple(r) for r in bm25_topk_from_index(
        segment_fts_index(spark, store), query, 10).collect()]
    assert again == want
    with pytest.raises(ValueError, match="overlaps the FTS store"):
        append_fts_segment(spark, store, folded_slice, append_id="mb9")


def test_fts_append_skip_existing_partial_overlap(spark, sf_dir, tmp_path):
    """skip_existing drops only the already-live ids: a half-old,
    half-new segment appends exactly its new half."""
    from duckdb_hybrid_doc_search_spark.index.fts_layout import (
        append_fts_segment, write_fts_segments)
    from duckdb_hybrid_doc_search_spark.operators.bm25 import (
        bm25_topk, bm25_topk_from_index, segment_fts_index)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "seg")
    write_fts_segments(docs.where(F.col("doc_id") % 3 == 0), store)
    # overlap: %3==0 already live; new: %3==1
    append_fts_segment(spark, store, docs.where(F.col("doc_id") % 3 <= 1),
                       append_id="ab", skip_existing=True)
    query = "spark vector join fast merge"
    got = [tuple(r) for r in bm25_topk_from_index(
        segment_fts_index(spark, store), query, 10).collect()]
    want = [tuple(r) for r in
            bm25_topk(docs.where(F.col("doc_id") % 3 <= 1), query,
                      10).collect()]
    assert got == want


def test_streaming_ivf_append_equals_batch_probe(spark, sf_dir, tmp_path):
    """The streaming vector-index maintenance loop must end at exactly
    the state the batch append sequence produces (frozen-centroid append
    equivalence), across multiple micro-batches, and stay
    redelivery-safe: re-appending an already-applied slice with
    skip_existing is a no-op, without it a loud error."""
    from duckdb_hybrid_doc_search_spark.index.ivf_layout import (
        APPEND_SPLIT_MOD, APPEND_SPLIT_REM, append_ivf_vectors,
        ensure_ivf_append_layout, ivf_partitioned_topk, read_layout_meta)
    from duckdb_hybrid_doc_search_spark.operators.knn import centroid_pred
    from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
        run_streaming_ivf_append)
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    run_root = str(tmp_path / "ivfrun")
    got = sorted(tuple(r) for r in run_streaming_ivf_append(
        spark, sf_dir, 5, 10, "t_ivf_app", trigger_files=3,
        run_root=run_root).collect())
    out_dir = ensure_ivf_append_layout(spark, emb, sf_dir)
    want = sorted(tuple(r) for r in ivf_partitioned_topk(
        spark, out_dir, emb, 5, 10).collect())
    assert got == want

    store = f"{run_root}/store"
    nlist = read_layout_meta(store)["nlist"]
    arriving = emb.where(
        (~centroid_pred("vec_id", nlist))
        & (F.col("vec_id") % APPEND_SPLIT_MOD == APPEND_SPLIT_REM))
    append_ivf_vectors(spark, store, arriving, skip_existing=True)
    again = sorted(tuple(r) for r in ivf_partitioned_topk(
        spark, store, emb, 5, 10).collect())
    assert again == want
    with pytest.raises(ValueError, match="overlaps the layout"):
        append_ivf_vectors(spark, store, arriving)
