"""Partition-local graph-ANN (HNSW-class) search via mapInPandas.

SURVEY.md §4.1(c) — the last unbuilt ANN option: the reference gets greedy
graph search from DuckDB's VSS HNSW extension (ref db.py:159-165). Spark
has no graph index, so the scale pattern is:

    partition the corpus deterministically (range on vec_id)
      -> each partition builds an in-memory navigable-small-world graph
         over ITS slice (numpy only, no native deps)
      -> the (tiny, bounded) query set rides into every partition via the
         task closure
      -> per-partition greedy top-k candidates stream out of mapInPandas
      -> one window takes the global top-k per query.

At 100 TB each executor holds only its partition's graph (built once per
task, O(|slice| * M) memory), queries are O(ef * log n) distance
evaluations per partition, and the merge is k rows per (query,
partition) — the classic scatter-gather ANN serving shape. Construction
is deterministic (sorted insert order, argsorted neighbor ties), so the
recall metric is a stable, recorded number vs the exact scan — never a
hope (same discipline as ann_ivf_recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SCORE_ROUND

HNSW_M = 8              # neighbors kept per node
HNSW_EF_CONSTRUCTION = 48
HNSW_EF_SEARCH = 48
HNSW_PARTITIONS = 16


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def build_nsw(vecs: np.ndarray, m: int = HNSW_M,
              ef: int = HNSW_EF_CONSTRUCTION) -> list[np.ndarray]:
    """Sequential-insert navigable-small-world graph over UNIT vectors.

    Each new node greedy-searches the current graph for its ef nearest,
    links bidirectionally to the m nearest, and over-full neighbor lists
    are trimmed back to the m closest — the single-layer core of HNSW
    (hierarchy adds log-factor routing, irrelevant at partition scale).

    Adjacency accumulates in Python lists — np.append would copy the
    whole array per inserted edge, going quadratic in partition size in
    the hot loop of every mapInPandas task. Trimming only ever sees a
    (2m+1)-element list, so the stable argsort there is O(m log m) noise;
    lists convert to arrays once, at the end.
    """
    n = len(vecs)
    adj: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        cand = search_nsw(vecs[:i], adj, vecs[i], min(m, i), ef)
        for j in cand:
            j = int(j)
            adj[i].append(j)
            adj[j].append(i)
            if len(adj[j]) > 2 * m:
                idx = np.asarray(adj[j], dtype=np.int64)
                sims = vecs[idx] @ vecs[j]
                order = np.argsort(-sims, kind="stable")[: 2 * m]
                adj[j] = [int(x) for x in idx[order]]
    return [np.asarray(a, dtype=np.int64) for a in adj]


def search_nsw(vecs: np.ndarray, adj: list[np.ndarray], q: np.ndarray,
               k: int, ef: int = HNSW_EF_SEARCH) -> np.ndarray:
    """Greedy best-first search from node 0; returns the k best node ids
    (cosine, descending, stable ties on id)."""
    import heapq

    n = len(vecs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    visited = {0}
    s0 = float(vecs[0] @ q)
    frontier = [(-s0, 0)]          # max-heap on similarity
    found = [(s0, 0)]              # min-heap of the best ef
    while frontier:
        neg_s, node = heapq.heappop(frontier)
        if -neg_s < found[0][0] and len(found) >= ef:
            break
        for nb in adj[node]:
            nb = int(nb)
            if nb in visited:
                continue
            visited.add(nb)
            s = float(vecs[nb] @ q)
            if len(found) < ef or s > found[0][0]:
                heapq.heappush(frontier, (-s, nb))
                heapq.heappush(found, (s, nb))
                if len(found) > ef:
                    heapq.heappop(found)
    best = sorted(found, key=lambda t: (-t[0], t[1]))[:k]
    return np.array([b[1] for b in best], dtype=np.int64)


def hnsw_topk(emb: DataFrame, k: int, n_queries: int = 10,
              n_partitions: int = HNSW_PARTITIONS) -> DataFrame:
    """Approximate top-k neighbors for the first n_queries vectors.

    Output: q_id, c_id, cos_sim, rank — same shape as knn.ivf_topk, so the
    recall harness is shared. The query block is bounded (n_queries × dim
    floats) and ships in the task closure; the corpus NEVER moves, only
    k·n_queries candidate rows per partition come back.
    """
    qrows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()  # bounded: n_queries rows of metadata-scale size
    )
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    q_vecs = _norm_rows(np.array([r.embedding for r in qrows],
                                 dtype=np.float64))

    def per_partition(batches):
        pdfs = [pdf for pdf in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        vecs = _norm_rows(np.array(
            [pdf["embedding"].iloc[int(i)] for i in order], dtype=np.float64
        ))
        adj = build_nsw(vecs)
        out_q, out_c, out_s = [], [], []
        for qi, qv in zip(q_ids, q_vecs):
            local = search_nsw(vecs, adj, qv, k)
            for li in local:
                out_q.append(int(qi))
                out_c.append(int(ids[li]))
                out_s.append(round(float(vecs[li] @ qv), SCORE_ROUND))
        yield pd.DataFrame(
            {"q_id": out_q, "c_id": out_c, "cos_sim": out_s}
        )

    cand = (
        emb.select("vec_id", "embedding")
        .repartitionByRange(n_partitions, "vec_id")
        .mapInPandas(per_partition,
                     "q_id long, c_id long, cos_sim double")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hnsw_recall_vs_exact(emb: DataFrame, k: int = 5,
                         n_queries: int = 10) -> DataFrame:
    """Measured recall of the graph search against the exact scan — one
    row: k, n_queries, mean_recall, n_self_hits (a self-match lost by the
    graph is an index bug, not an approximation)."""
    from .knn import knn_join

    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    exact = knn_join(queries, corpus, k).select(
        "q_id", F.col("c_id").alias("e_id")
    )
    approx = hnsw_topk(emb, k, n_queries).select("q_id", "c_id")
    hits = exact.join(
        approx,
        (exact["q_id"] == approx["q_id"]) & (F.col("e_id") == F.col("c_id")),
    ).groupBy(exact["q_id"].alias("qq")).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    per_q = (
        exact.select("q_id").distinct()
        .join(hits, F.col("q_id") == F.col("qq"), "left")
        .select(
            "q_id",
            (F.coalesce("n_hit", F.lit(0)) / F.lit(k)).alias("recall"),
        )
    )
    self_hits = approx.where(F.col("q_id") == F.col("c_id"))
    return per_q.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), SCORE_ROUND).alias("mean_recall"),
    ).crossJoin(
        F.broadcast(self_hits.agg(F.count(F.lit(1)).alias("n_self_hits")))
    )
