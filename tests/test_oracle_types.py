"""Oracle-SQL type lint.

The correctness driver serializes DuckDB results to hash them against the
Spark side; DuckDB's 128-bit HUGEINT (the default result of ``sum()`` over
integer columns) round-trips differently from BIGINT in that path and
produced round-3's only hash mismatches (events_sessionization,
events_props_json_stats, events_props_map_stats — all values identical,
representation different). Every oracle must therefore stay within types
Spark can produce: lint with ``DESCRIBE`` and fail on HUGEINT/UHUGEINT
anywhere in the result schema, including nested types.

No data is scanned — DESCRIBE only binds the query, so this runs in
milliseconds per oracle against the sf0.001 views.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if not os.path.exists(path):
            pytest.skip(f"testdata missing: {path}")
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return c


def test_no_hugeint_in_any_oracle(con):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if any(b in typ.upper() for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle SQL produces 128-bit integer columns the driver hashes "
        f"differently from Spark LongType — cast to ::BIGINT: {offenders}"
    )


def test_decimal_oracle_columns_match_spark_decimals(con, spark, sf_dir):
    """DECIMAL oracle columns are legitimate ONLY where the Spark side is
    also decimal: the driver renders DuckDB Decimal via str() ('0.500')
    and Spark float via repr ('0.5'), so a DECIMAL column paired with a
    Spark DOUBLE hash-mismatches even when values are equal — the round-5
    dedup_threshold_curve bug (a bare VALUES (0.5) literal is
    DECIMAL(4,3)). Compares each oracle's DECIMAL columns against the
    registered Spark query's schema by column name."""
    offenders = {}
    qs = entry.queries()
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        dec_cols = [col for col, typ, *_ in desc if "DECIMAL" in typ.upper()]
        if not dec_cols:
            continue
        from duckdb_hybrid_doc_search_spark.plans import registry
        if registry.REGISTRY[name].executes_on_build:
            # calling the Spark side EXECUTES work (e.g. drives a bounded
            # stream) — too heavy for a schema-only lint; such a query
            # would surface in its own stream==batch equality suite
            continue
        sdf = qs[name](spark, sf_dir)
        stypes = {f.name: f.dataType.typeName() for f in sdf.schema.fields}
        bad = [
            c for c in dec_cols
            if not stypes.get(c, "").startswith("decimal")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle DECIMAL columns whose Spark twin is not decimal — the "
        "driver's string-render hash will mismatch; cast the oracle to "
        f"::DOUBLE (or Spark to decimal): {offenders}"
    )
