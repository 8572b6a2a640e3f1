"""Generic as-of join utility vs pandas.merge_asof (the behavioral spec)
and vs the hand-built events specialization."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_hybrid_doc_search_spark.functions.asof import asof_join_backward


@st.composite
def _tables(draw):
    n_l = draw(st.integers(1, 12))
    n_r = draw(st.integers(0, 12))
    keys = st.integers(0, 2)
    ts = st.integers(0, 30)
    left = [(draw(keys), draw(ts), i) for i in range(n_l)]
    right = [(draw(keys), draw(ts), 100 + i) for i in range(n_r)]
    return left, right


@settings(max_examples=25, deadline=None)
@given(_tables())
def test_asof_matches_pandas_merge_asof(spark, tables):
    left_rows, right_rows = tables
    left = spark.createDataFrame(left_rows, "k int, ts long, lid int")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)],
        "k int, ts long, rid int",
    ).where("k is not null")
    got = {
        (r.lid, r.rid_asof)
        for r in asof_join_backward(left, right, "k", "ts", ["rid"]).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values(
        ["ts", "lid"]
    )
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "rid"]).sort_values(
        ["ts", "rid"]
    )
    if len(rp):
        m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        # at duplicate right timestamps merge_asof keeps the LAST row in
        # sort order; the window form keeps the last in (ts, side) order —
        # identical because rp is sorted by (ts, rid)
        exp = {
            (int(r.lid), None if pd.isna(r.rid) else int(r.rid))
            for r in m.itertuples()
        }
    else:
        exp = {(int(r.lid), None) for r in lp.itertuples()}
    assert got == exp


def test_asof_reproduces_events_specialization(spark, sf_dir):
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.events import (
        asof_click_before_purchase, ts_micros,
    )

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", "event_id", ts_micros(events).alias("us"),
        "event_type",
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "us"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("click_us"), F.col("us")
    )
    generic = asof_join_backward(
        purchases, clicks, "user_id", "us", ["click_us"]
    )
    got = {
        (r.user_id, r.event_id, r.us, r.click_us_asof)
        for r in generic.collect()
    }
    spec = {
        (r.user_id, r.event_id, r.purchase_us, r.last_click_us)
        for r in asof_click_before_purchase(events).collect()
    }
    assert got == spec and len(got) > 0
