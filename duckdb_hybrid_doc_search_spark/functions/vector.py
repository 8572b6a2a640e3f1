"""Vector math as pure SQL expressions (Spark + DuckDB pairs).

Replaces the reference's HNSW-accelerated `array_cosine_distance` scan
(searcher.py:127-143, index at db.py:159-165) with an exact, embarrassingly
parallel expression over a narrow embeddings table — whole-stage-codegen'd
JVM arithmetic, no Python in the loop. Both engines fold left-to-right over
float64, so results are bit-comparable before the final rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """DuckDB `array_cosine_distance` semantics: 1 - cosine_similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


def lit_vector(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance via the dot identity ||a||² - 2a·b + ||b||² —
    three left-to-right folds, so the DuckDB twin (dd_l2sq, same
    identity) is bit-comparable before rounding; an elementwise
    sum-of-squares would fold in a different order."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


# --- DuckDB fragments ------------------------------------------------------


def dd_lit_vector(vec: Sequence[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]"


def dd_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def dd_cosine_similarity(a: str, b: str) -> str:
    return (
        f"({dd_dot(a, b)} / (sqrt({dd_dot(a, a)}) * sqrt({dd_dot(b, b)})))"
    )


def dd_cosine_distance(a: str, b: str) -> str:
    return f"(1.0 - {dd_cosine_similarity(a, b)})"


def dd_l2sq(a: str, b: str) -> str:
    """Same dot-identity formula as :func:`l2sq` for bit-parity."""
    return f"({dd_dot(a, a)} - 2.0 * {dd_dot(a, b)} + {dd_dot(b, b)})"
