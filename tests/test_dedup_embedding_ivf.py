"""Cell-bucketed embedding near-dup (dedup_embedding_ivf): subset-of-
exact property, recall recorded, and oracle parity is covered by
tests/test_oracle_parity.py like every registered query."""

from __future__ import annotations

from duckdb_hybrid_doc_search_spark.operators import dedup


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_pairs_are_a_subset_of_exact_with_recorded_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup.dedup_embedding_cosine(emb).collect()
    }
    single = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup.dedup_embedding_ivf(emb, nprobe=1).collect()
    }
    multi = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in dedup.dedup_embedding_ivf(emb).collect()  # nprobe=2
    }
    # every bucketed pair is a true pair with the identical score (the
    # bucketing only prunes candidates, never invents or rescores) —
    # holds at every probe width
    for bucketed in (single, multi):
        for pair, sim in bucketed.items():
            assert pair in exact and exact[pair] == sim, pair
    # multi-probe is a strict widening: every single-probe pair is a
    # multi-probe pair (rank-1 cells are a subset of rank<=2 cells)
    assert set(single) <= set(multi)
    assert exact, "exact pair set empty: threshold/corpus drifted"
    # Recorded recall (SemDeDup's trade, measured not hoped). On THIS
    # corpus the vectors are uniform-random, the worst case for any
    # bucketing: near-dup pairs are random coincidences with no cluster
    # structure to exploit. Measured: single-probe 17/66 = 0.258 at
    # sf0.001, 24/59 = 0.407 at sf0.01; top-2 multi-probe (r11 VERDICT
    # #2) recovers boundary pairs — a pair is found if ANY of the 2x2
    # cell combinations collide — lifting recall to 42/66 = 0.636 at
    # sf0.001 and 42/59 = 0.712 at sf0.01. Real embedding corpora
    # cluster (that is why near-dups EXIST there), putting true pairs
    # in shared cells far more often. The pins guard collapse, not the
    # uniform-case level.
    r1 = len(single) / len(exact)
    r2 = len(multi) / len(exact)
    assert r1 > 0.15, (len(single), len(exact))
    assert r2 >= r1, (r2, r1)
    assert r2 > 0.5, (len(multi), len(exact))


def test_multiprobe_recall_on_clustered_corpus(spark):
    """The recall story on REALISTIC data: the sf corpora are
    uniform-random (worst case for bucketing — near-dup pairs are
    coincidences with no cluster structure). Real embedding corpora
    cluster, which is why near-dups exist at all; on a clustered
    synthetic corpus (8 centers, small per-point noise) the cell
    assignment co-locates nearly every true pair and top-2 multi-probe
    recovers the boundary stragglers — recall must be near-perfect, not
    the uniform-case ~0.6."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n_centers, per = 16, 8, 40
    centers = rng.normal(size=(n_centers, dim))
    rows = []
    for i in range(n_centers * per):
        c = centers[i % n_centers]
        v = c + rng.normal(scale=0.08, size=dim)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.vec_a, r.vec_b)
             for r in dedup.dedup_embedding_cosine(emb).collect()}
    multi = {(r.vec_a, r.vec_b)
             for r in dedup.dedup_embedding_ivf(emb).collect()}
    assert multi <= exact
    assert len(exact) > 100, len(exact)  # clusters genuinely dense
    recall = len(multi) / len(exact)
    assert recall >= 0.9, (len(multi), len(exact), recall)
