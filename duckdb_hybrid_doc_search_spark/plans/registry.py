"""Registry of driver-checkable queries.

Every operator the engine claims (SURVEY.md §2 inventory + the LLM-pipeline
extensions) registers here as a (Spark callable, DuckDB oracle SQL) pair;
``__spark_entry__.py`` re-exports the registry to the correctness driver.
Oracle is None only for genuinely non-SQL-expressible ops (the driver then
records a weaker rows-only check).
"""

from __future__ import annotations

import os
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
    # True = do NOT window-jump this round (late additions that would
    # otherwise displace higher-priority unchecked/RECHECK entries from
    # the gate's ~50-row window; they rotate in next round when the flag
    # is cleared alongside RECHECK)
    defer_gate: bool = False


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, bench: bool = True,
             defer_gate: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QueryDef(name, fn, oracle, bench, defer_gate)
        return fn

    return deco


def bench_queries() -> dict[str, SparkQuery]:
    """Queries included in the timed benchmark loop (excludes wrappers
    whose cost is dominated by third-party internals, e.g. MLlib
    approxSimilarityJoin — their correctness/recall is still tested)."""
    _load_all()
    return {n: qd.spark_fn for n, qd in REGISTRY.items() if qd.bench}


# Queries whose IMPLEMENTATION changed since their last green driver row —
# they jump the gate queue right after never-checked queries. Maintained
# per round; safe to leave stale (costs only window slots, never coverage).
RECHECK: set[str] = {
    "bm25_topk",
    "bm25_batch_topk",
    "hybrid_search_fused",
    "hybrid_search_reranked",
}


def _checked_last_round() -> set[str]:
    """Names with a row in the NEWEST CORRECTNESS_r{N}.json (repo root).

    The external gate only verifies the first ~50 entries of ``queries()``
    per round, so ordering is coverage policy: never-checked oracled
    queries first, then changed implementations, then the already-green
    tail, with no-oracle (rows-only) entries last. Keying off the latest
    round's file makes the window self-rotating — whatever missed this
    round's window sorts first next round.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    best_n, names = -1, set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_n:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            best_n, names = int(m.group(1)), set(data)
    return names


def _gate_ordered() -> list[str]:
    checked = _checked_last_round()

    def rank(item: tuple[str, QueryDef]) -> int:
        name, qd = item
        if qd.oracle is None:
            return 3  # rows-only check: weakest signal, out of the window
        if name not in checked:
            return 2 if qd.defer_gate else 0  # never verified: jump queue
        if name in RECHECK:
            return 1  # verified before, but the implementation changed
        return 2

    # stable sort preserves registration order within each class
    return [n for n, _ in sorted(REGISTRY.items(), key=rank)]


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: REGISTRY[name].spark_fn for name in _gate_ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _gate_ordered()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import (chunker_queries, doc_search_queries,  # noqa: F401
                   layout_queries, mllib_queries, multimodal_queries,
                   pipeline_queries, relational_queries, sql_queries)

    _LOADED = True
