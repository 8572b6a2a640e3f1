"""Exact cosine kNN and corpus-to-corpus similarity joins.

Replaces the reference's HNSW probe (`array_cosine_distance(embedding, ?)
ORDER BY score ASC LIMIT ?`, searcher.py:127-143) with an exact scan: a
whole-stage-codegen'd dot-product expression over a NARROW embeddings table
(doc_id + vector only — §4.3 layout keeps 100 TB of `content` out of this
scan), then TakeOrderedAndProject top-k. Embarrassingly parallel: each
partition scores independently, only (k x partitions) rows reach the driver.

The 1-vs-N query probe generalizes to the M-vs-N similarity join (SURVEY.md
§2.4 extension): broadcast the smaller side, score per pair, per-query top-k
via window row_number — the scale path for ANN (IVF/LSH bucketing) lives in
operators/dedup.py (LSH) and can pre-bucket both sides of this join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SCORE_ROUND
from ..functions import vector as V


def cosine_distance_topk(embeddings: DataFrame, query_vec: Sequence[float],
                         k: int, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """(doc_id, vss_score=cosine DISTANCE) ascending top-k — Q4 semantics."""
    qv = V.lit_vector(query_vec)
    return (
        embeddings.select(
            F.col(id_col).alias("doc_id"),
            F.round(V.cosine_distance(F.col(vec_col), qv), SCORE_ROUND).alias(
                "vss_score"
            ),
        )
        .orderBy(F.asc("vss_score"), F.asc("doc_id"))
        .limit(k)
    )


def knn_join(queries: DataFrame, corpus: DataFrame, k: int,
             q_id: str = "q_id", q_vec: str = "q_vec",
             c_id: str = "c_id", c_vec: str = "c_vec") -> DataFrame:
    """Brute-force top-k neighbors per query row (higher similarity first).

    The queries side is broadcast — at scale it is the bounded side (a batch
    of probe vectors); the corpus streams. Output: q_id, c_id, cos_sim, rank.
    """
    pairs = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(q_id),
        F.col(c_id),
        F.round(
            V.cosine_similarity(F.col(q_vec), F.col(c_vec)), SCORE_ROUND
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# --- DuckDB oracle SQL ------------------------------------------------------


def dd_cosine_distance_topk_sql(query_vec: Sequence[float], k: int,
                                table: str = "embeddings",
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> str:
    qv = V.dd_lit_vector(query_vec)
    dist = V.dd_cosine_distance(vec_col, qv)
    return f"""
SELECT {id_col} AS doc_id, round({dist}, {SCORE_ROUND}) AS vss_score
FROM {table}
ORDER BY vss_score ASC, doc_id ASC LIMIT {k}
""".strip()


def dd_vss_scored_cte(query_vec: Sequence[float], k: int,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    qv = V.dd_lit_vector(query_vec)
    dist = V.dd_cosine_distance(vec_col, qv)
    return f"""
vss_scored AS (
  SELECT {id_col} AS doc_id, round({dist}, {SCORE_ROUND}) AS vss_score
  FROM {table}
  ORDER BY vss_score ASC, doc_id ASC LIMIT {k}
)
""".strip()


def dd_knn_join_sql(k: int, queries_sql: str, table: str = "embeddings",
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """Oracle for :func:`knn_join`; `queries_sql` yields (q_id, q_vec)."""
    sim = V.dd_cosine_similarity("q.q_vec", f"c.{vec_col}")
    return f"""
WITH q AS ({queries_sql}),
pairs AS (
  SELECT q.q_id, c.{id_col} AS c_id, round({sim}, {SCORE_ROUND}) AS cos_sim
  FROM {table} c CROSS JOIN q
),
ranked AS (
  SELECT q_id, c_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS rank
  FROM pairs
)
SELECT q_id, c_id, cos_sim, rank FROM ranked WHERE rank <= {k}
""".strip()
