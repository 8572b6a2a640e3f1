"""Streaming twins as registered queries (rows-only, bench=False).

Each callable drives the bounded file-stream to completion
(processAllAvailable over the sf_dir events parquet) and returns the
final result DataFrame — so the streaming surface is part of the same
driver contract as everything else. Correctness is enforced by the
stream==batch equality tests in tests/test_streaming.py (batch is the
specification); these registrations are execution coverage, not timing
coverage (a bounded-stream drive measures orchestration, not engine
throughput — excluded from the bench loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register


@register("streaming_windowed_agg", oracle=None, bench=False,
          executes_on_build=True)
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg driven to completion (twin of
    events_windowed_agg; equality-tested in test_streaming.py)."""
    from ..streaming.events import run_streaming_windowed_agg

    return run_streaming_windowed_agg(spark, sf_dir, "reg_ev_win")


@register("streaming_sessionize", oracle=None, bench=False,
          executes_on_build=True)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState gap sessionizer driven to completion (twin
    of events_sessionization for closed sessions)."""
    from ..streaming.events import run_streaming_sessionize

    return run_streaming_sessionize(spark, sf_dir, "reg_ev_sess")


@register("streaming_latest_per_user", oracle=None, bench=False,
          executes_on_build=True)
def streaming_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful CDC upsert snapshot driven to completion (twin of
    events_latest_per_user)."""
    from ..streaming.events import run_streaming_latest_per_user

    return run_streaming_latest_per_user(spark, sf_dir, "reg_ev_latest")
