"""Property-based invariants for the analytics family — pure-Python
mirrors of the Spark/DuckDB formulas under hypothesis (the parity suite
pins the expressions; these pin the math)."""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import given
from hypothesis import strategies as st

from duckdb_hybrid_doc_search_spark.operators.analytics import ROLLING_DAYS

user_days = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 30)),  # (user, day)
    min_size=1,
    max_size=200,
)


@given(user_days)
def test_rolling_actives_explode_equals_bruteforce(pairs):
    """The bounded x7-explode algorithm == the brute-force definition
    'distinct users with >=1 event in [d-6, d]' for every observed day."""
    ud = set(pairs)
    observed_days = {d for _, d in ud}
    # mirror of the operator: each (u, d) contributes u to days d..d+6,
    # counted distinct, reported for observed days only
    contrib = defaultdict(set)
    for u, d in ud:
        for dd in range(d, d + ROLLING_DAYS):
            contrib[dd].add(u)
    got = {d: len(contrib[d]) for d in observed_days}
    want = {
        d: len({u for (u, dd) in ud if d - (ROLLING_DAYS - 1) <= dd <= d})
        for d in observed_days
    }
    assert got == want


counts_tables = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 6), st.integers(1, 50)),
    min_size=1,
    max_size=60,
)


@given(counts_tables)
def test_chi_square_zero_iff_product_distribution(cells):
    """chi2 computed from a contingency built as an exact product of
    marginals is ~0; and contributions are always >= 0."""
    # collapse duplicates
    obs = defaultdict(int)
    for r, c, n in cells:
        obs[(r, c)] += n
    rows = sorted({r for r, _ in obs})
    cols = sorted({c for _, c in obs})
    row_n = {r: sum(v for (rr, _), v in obs.items() if rr == r) for r in rows}
    col_n = {c: sum(v for (_, cc), v in obs.items() if cc == c) for c in cols}
    n = sum(obs.values())

    def chi2(table):
        total = sum(table.values())
        rn = defaultdict(int)
        cn = defaultdict(int)
        for (r, c), v in table.items():
            rn[r] += v
            cn[c] += v
        s = 0.0
        for r in rn:
            for c in cn:
                e = rn[r] * cn[c] / total
                o = table.get((r, c), 0)
                s += (o - e) ** 2 / e
        return s

    assert chi2(obs) >= -1e-9
    # exact product table: o(r,c) = row_n*col_n/n may be fractional; scale
    # by n so every cell is integral: o'(r,c) = row_n*col_n, total n^2
    product = {
        (r, c): row_n[r] * col_n[c] for r in rows for c in cols
    }
    assert abs(chi2(product)) < 1e-6


events_seq = st.lists(
    st.tuples(st.integers(0, 10**6), st.floats(-100, 100, allow_nan=False)),
    min_size=2,
    max_size=50,
    unique_by=lambda t: t[0],
)


@given(events_seq)
def test_twap_is_convex_combination(seq):
    seq = sorted(seq)
    num = 0.0
    den = 0.0
    for (t0, v0), (t1, _) in zip(seq, seq[1:]):
        dt = t1 - t0
        num += v0 * dt
        den += dt
    if den == 0:
        return
    twap = num / den
    vals = [v for _, v in seq[:-1]]  # last event carries no weight
    assert min(vals) - 1e-9 <= twap <= max(vals) + 1e-9


quality_rows = st.lists(
    st.tuples(st.integers(0, 10**6), st.floats(0, 1, allow_nan=False)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(quality_rows)
def test_survivorship_max_struct_equals_spec(rows):
    """max(struct(quality, -doc_id)) picks highest quality, ties -> lowest
    doc_id — the survivorship contract."""
    got = max(rows, key=lambda t: (t[1], -t[0]))
    best_q = max(q for _, q in rows)
    spec = min(i for i, q in rows if q == best_q)
    assert got[0] == spec


pmi_counts = st.tuples(
    st.integers(5, 1000),  # c_xy
    st.integers(5, 10**6),  # c_x
    st.integers(5, 10**6),  # c_y
    st.integers(10**3, 10**9),  # T
    st.integers(10**3, 10**9),  # B
)


@given(pmi_counts)
def test_pmi_monotone_in_joint_count(t):
    c_xy, c_x, c_y, big_t, big_b = t

    def pmi(cxy):
        return math.log(
            (cxy / big_b) / ((c_x / big_t) * (c_y / big_t))
        )

    assert pmi(c_xy + 1) > pmi(c_xy)


def test_merge_upsert_conservation(spark, sf_dir):
    """MERGE bookkeeping invariant on real data: n_after must equal
    n_before + inserts - deletes, and every CDC class is non-empty at
    this scale (the derivation rules hit all mod classes)."""
    from duckdb_hybrid_doc_search_spark.operators import mining

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    r = mining.orders_merge_upsert(orders).collect()[0]
    assert r["n_after"] == r["n_before"] + r["n_inserted"] - r["n_deleted"]
    assert r["n_inserted"] > 0 and r["n_updated"] > 0 and r["n_deleted"] > 0
    assert r["total_price_after"] > 0


def test_basket_pairs_support_bounds(spark, sf_dir):
    """Association-mining invariants: pair support can never exceed
    either item's support, lift is positive, and output respects the
    MIN_SUPPORT floor and deterministic ordering."""
    from duckdb_hybrid_doc_search_spark.operators import mining

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = mining.basket_part_pairs(li).collect()
    assert rows, "expected at least one co-occurring pair"
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["pair_cnt"] >= mining.MIN_SUPPORT
        assert r["pair_cnt"] <= min(r["cnt_a"], r["cnt_b"])
        assert r["lift"] > 0
        assert r["part_a"] < r["part_b"]


def test_incremental_merge_equals_direct(spark, sf_dir):
    """The partial-merge result must be bit-identical to aggregating the
    full table directly (decimal sums are exactly associative)."""
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.operators import mining

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    merged = {r["o_orderstatus"]: r for r in
              mining.incremental_agg_merge(orders).collect()}
    direct = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,8)")), 2)
            .cast("double").alias("total_price"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k in direct:
        assert merged[k]["n"] == direct[k]["n"]
        assert merged[k]["total_price"] == direct[k]["total_price"]
