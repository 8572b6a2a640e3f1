"""Streaming micro-bench: honest throughput numbers for the streaming
twins (VERDICT r4 #7 — the trio is registered `bench=False` because a
bounded-stream drive measures orchestration, not engine throughput; this
tool measures that orchestration EXPLICITLY and records rows/s so the
streaming claims carry a number).

Run from the repo root:  python tools/stream_bench.py  [sf_dir]

For each streaming twin, drives the bounded file-stream to completion
twice (first drive pays codegen/state-store setup; the second, against a
fresh query name, is recorded) on BOTH state-store providers (HDFS-heap
and RocksDB — the production-scale backend), and writes STREAMBENCH.json
plus a `## STREAMBENCH` section in SCALING.md.

The whole events table arrives as ONE micro-batch (single parquet file),
so rows/s here is state-machine throughput (applyInPandasWithState /
watermark agg / dropDuplicatesWithinWatermark), not trigger latency.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ["PYTHONPATH"] = (
    _HERE + os.pathsep + os.environ.get("PYTHONPATH", "")
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
STATE_KEY = "spark.sql.streaming.stateStore.providerClass"


#: per-micro-batch state-operator metrics of the LAST interval-join
#: drive (VERDICT r7 #7: the twin is 4-10x the others, and the record
#: must show why — the state-write volume, not a plan bug). Keyed by
#: batchId; populated by _drive_interval_join, persisted into
#: STREAMBENCH.json.
_LAST_STATE_METRICS: list[dict] = []


def _drive_fts_append(spark, sf_dir, query_name="sb_ftsapp"):
    """Adapter: the FTS append loop takes (query, top_k) probe args."""
    from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
        run_streaming_fts_append)

    return run_streaming_fts_append(
        spark, sf_dir, "spark vector join fast merge", 10,
        query_name=query_name)


def _drive_ivf_append(spark, sf_dir, query_name="sb_ivfapp"):
    """Adapter: the IVF append loop takes (k, n_queries) probe args."""
    from duckdb_hybrid_doc_search_spark.streaming.index_maintenance import (
        run_streaming_ivf_append)

    return run_streaming_ivf_append(spark, sf_dir, 5, 10,
                                    query_name=query_name)


def _drive_ingest(spark, sf_dir, query_name="sb_ingest"):
    from duckdb_hybrid_doc_search_spark.streaming.ingest import (
        run_streaming_ingest)

    return run_streaming_ingest(spark, sf_dir, query_name=query_name)


def _drive_interval_join(spark, sf_dir, query_name="sb_ivjoin"):
    """Adapter: run_streaming_interval_join returns the live query, not
    the driven result — drive it to completion like the other runners,
    and capture per-micro-batch state-operator metrics before stop()
    (they are gone once the query stops)."""
    from duckdb_hybrid_doc_search_spark.streaming.events import (
        run_streaming_interval_join)

    q = run_streaming_interval_join(spark, sf_dir, query_name)
    try:
        q.processAllAvailable()
        _LAST_STATE_METRICS.clear()
        for prog in q.recentProgress:
            for so in prog.get("stateOperators", []):
                _LAST_STATE_METRICS.append({
                    "batch_id": prog.get("batchId"),
                    "operator": so.get("operatorName"),
                    "rows_total": so.get("numRowsTotal"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "rows_removed": so.get("numRowsRemoved"),
                    "updates_ms": so.get("allUpdatesTimeMs"),
                    "removals_ms": so.get("allRemovalsTimeMs"),
                    "commit_ms": so.get("commitTimeMs"),
                })
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_hybrid_doc_search_spark.session import get_spark
    from duckdb_hybrid_doc_search_spark.streaming import events as se

    spark = get_spark("stream-bench")
    n_rows = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()

    from duckdb_hybrid_doc_search_spark.streaming import docs as sd

    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    n_emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).count()
    # runner -> (drive fn, input-row count for the rows/s denominator)
    runners = {
        "sessionize_applyInPandasWithState": (se.run_streaming_sessionize,
                                              n_rows),
        "windowed_agg_watermark": (se.run_streaming_windowed_agg, n_rows),
        "latest_per_user_stateful_upsert": (se.run_streaming_latest_per_user,
                                            n_rows),
        "dedup_within_watermark": (se.run_streaming_dedup, n_rows),
        # round-6 registered twins
        "enrich_stream_static_join": (se.run_streaming_enrich, n_rows),
        "distinct_users_two_stage":
            (se.run_streaming_windowed_distinct_users, n_rows),
        "funnel_applyInPandasWithState": (se.run_streaming_funnel_stages,
                                          n_rows),
        "asof_join_stateful": (se.run_streaming_asof_click_purchase, n_rows),
        "interval_join_stream_stream": (_drive_interval_join, n_rows),
        "doc_dedup_streaming_agg": (sd.run_streaming_doc_dedup, n_docs),
        # r8: the decide->append->repeat ingestion loop (foreachBatch
        # against the written signature store); rows/s denominator is
        # the full docs table (the loop filters to the batch side)
        "incremental_dedup_loop": (sd.run_streaming_incremental_dedup,
                                   n_docs),
        # r10: index-maintenance loops (segment/cell appends against the
        # written FTS and IVF layouts) and the composed ingestion
        # pipeline (dedup -> quality -> index) — all foreachBatch, so
        # provider choice is inert for them; recorded under both anyway
        # for one uniform table
        "fts_segment_append_loop": (_drive_fts_append, n_docs),
        "ivf_append_loop": (_drive_ivf_append, n_emb),
        "ingest_pipeline_loop": (_drive_ingest, n_docs),
    }
    out: dict[str, dict] = {}
    for provider_name, provider in (("hdfs_heap", None),
                                    ("rocksdb", ROCKSDB)):
        if provider is None:
            spark.conf.unset(STATE_KEY)
        else:
            spark.conf.set(STATE_KEY, provider)
        for name, (fn, rows_in) in runners.items():
            # warm drive (codegen + provider init), then the timed drive
            fn(spark, sf_dir, query_name=f"sb_{provider_name}_{name}_w")
            t0 = time.perf_counter()
            res = fn(spark, sf_dir, query_name=f"sb_{provider_name}_{name}")
            n_out = res.count()
            sec = time.perf_counter() - t0
            rec = {
                "sec": round(sec, 3),
                "rows_in": rows_in,
                "rows_out": n_out,
                "rows_per_sec": round(rows_in / sec),
            }
            if name == "interval_join_stream_stream":
                rec["state_per_batch"] = list(_LAST_STATE_METRICS)
            out.setdefault(name, {})[provider_name] = rec
            print(f"{name} [{provider_name}]: {sec:.2f}s "
                  f"({rows_in / sec:,.0f} rows/s, {n_out} out)")
    spark.conf.unset(STATE_KEY)

    payload = {"sf_dir": sf_dir, "rows_in": n_rows, "queries": out}
    with open(os.path.join(_HERE, "STREAMBENCH.json"), "w") as f:
        json.dump(payload, f, indent=1)

    lines = [
        "## STREAMBENCH — streaming-twin throughput "
        f"(bounded drive, {os.path.basename(sf_dir)}, "
        f"{n_rows:,} events in one micro-batch)",
        "",
        "Steady-state drive (2nd run) on both state-store providers; "
        "rows/s = input rows / wall sec through the full streaming "
        "query (source -> stateful operator -> memory sink). "
        "Generated by tools/stream_bench.py; raw in STREAMBENCH.json.",
        "",
        "| query | heap sec | heap rows/s | rocksdb sec | rocksdb rows/s |",
        "|---|---|---|---|---|",
    ]
    for name, provs in out.items():
        h, r = provs["hdfs_heap"], provs["rocksdb"]
        lines.append(
            f"| {name} | {h['sec']} | {h['rows_per_sec']:,} "
            f"| {r['sec']} | {r['rows_per_sec']:,} |"
        )
    block = "\n".join(lines) + "\n"
    scaling = os.path.join(_HERE, "SCALING.md")
    with open(scaling) as f:
        text = f.read()
    if "## STREAMBENCH" in text:
        text = re.sub(
            r"## STREAMBENCH.*?(?=\n## (?!STREAMBENCH)|\Z)", block, text,
            flags=re.DOTALL,
        )
    else:
        text = text.rstrip("\n") + "\n\n" + block
    with open(scaling, "w") as f:
        f.write(text)
    print("wrote STREAMBENCH.json + SCALING.md section")
    spark.stop()


if __name__ == "__main__":
    main()
