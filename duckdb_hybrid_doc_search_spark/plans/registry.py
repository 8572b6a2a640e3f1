"""Registry of driver-checkable queries.

Every operator the engine claims (SURVEY.md §2 inventory + the LLM-pipeline
extensions) registers here as a (Spark callable, DuckDB oracle SQL) pair;
``__spark_entry__.py`` re-exports the registry to the correctness driver.
Oracle is None only for genuinely non-SQL-expressible ops (the driver then
records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    bench: bool = True  # include in bench.py's timed loop


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, bench: bool = True):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QueryDef(name, fn, oracle, bench)
        return fn

    return deco


def bench_queries() -> dict[str, SparkQuery]:
    """Queries included in the timed benchmark loop (excludes wrappers
    whose cost is dominated by third-party internals, e.g. MLlib
    approxSimilarityJoin — their correctness/recall is still tested)."""
    _load_all()
    return {n: qd.spark_fn for n, qd in REGISTRY.items() if qd.bench}


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: qd.spark_fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import (chunker_queries, doc_search_queries,  # noqa: F401
                   mllib_queries, multimodal_queries, pipeline_queries,
                   relational_queries)

    _LOADED = True
