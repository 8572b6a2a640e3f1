"""Cell-bucketed embedding near-dup (dedup_embedding_ivf): subset-of-
exact property, recall recorded, the multiprobe layout's APPEND path
(base+append == one-shot, r12 VERDICT #2), and oracle parity is covered
by tests/test_oracle_parity.py like every registered query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
        for r in dedup.dedup_embedding_ivf(emb).collect()  # nprobe=3 (r13)
    }
    # every bucketed pair is a true pair with the identical score (the
    # bucketing only prunes candidates, never invents or rescores) —
    # holds at every probe width
    for bucketed in (single, multi):
        for pair, sim in bucketed.items():
            assert pair in exact and exact[pair] == sim, pair
    # multi-probe is a strict widening: every single-probe pair is a
    # multi-probe pair (rank-1 cells are a subset of rank<=p cells)
    assert set(single) <= set(multi)
    assert exact, "exact pair set empty: threshold/corpus drifted"
    # Recorded recall (SemDeDup's trade, measured not hoped). On THIS
    # corpus the vectors are uniform-random, the worst case for any
    # bucketing: near-dup pairs are random coincidences with no cluster
    # structure to exploit. Measured (PERF_NOTES r13 price table):
    # single-probe 0.258 at sf0.001 / 0.407 at sf0.01; top-2 0.636 /
    # 0.712; top-3 (the r13 operating point, r12 VERDICT #5) 0.924 /
    # 0.915 — clearing the >=0.8 bar SemDeDup-class production sweeps
    # want, at pair space ~p^2*N^1.5/2. Real embedding corpora cluster
    # (that is why near-dups EXIST there), putting true pairs in shared
    # cells far more often. The pins guard collapse, not the
    # uniform-case level.
    r1 = len(single) / len(exact)
    r2 = len(multi) / len(exact)
    assert r1 > 0.15, (len(single), len(exact))
    assert r2 >= r1, (r2, r1)
    assert r2 > 0.8, (len(multi), len(exact))


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


# --- multiprobe append path (r12 VERDICT #2) ---------------------------------


def test_multiprobe_append_equals_one_shot(spark, sf_dir, tmp_path):
    """The append-equivalence contract: a layout built over ~80% of the
    vectors and grown to 100% via append_multiprobe_vectors must equal
    a one-shot write_ivf_multiprobe over the full table ROW FOR ROW
    (same frozen nlist + centroid set + top-p assignment rule), and the
    dedup probe over either must emit the identical pair set."""
    from duckdb_hybrid_doc_search_spark.index.ivf_layout import (
        APPEND_SPLIT_MOD, APPEND_SPLIT_REM, append_multiprobe_vectors,
        write_ivf_multiprobe)
    from duckdb_hybrid_doc_search_spark.operators.knn import (
        centroid_pred, derive_nlist)

    emb = _emb(spark, sf_dir)
    one_shot = str(tmp_path / "one_shot")
    grown = str(tmp_path / "grown")
    write_ivf_multiprobe(emb, one_shot, p=2)

    nlist = derive_nlist(emb.count())
    is_new = (~centroid_pred("vec_id", nlist)) & (
        F.col("vec_id") % APPEND_SPLIT_MOD == APPEND_SPLIT_REM
    )
    write_ivf_multiprobe(emb.where(~is_new), grown, nlist=nlist, p=2)
    append_multiprobe_vectors(spark, grown, emb.where(is_new))

    cols = ["vec_id", "cell"]
    a = sorted(map(tuple, spark.read.parquet(one_shot)
                   .select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(grown)
                   .select(*cols).collect()))
    assert a == b and len(a) > 0
    pairs = lambda d: sorted(  # noqa: E731
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup.dedup_embedding_ivf(
            emb, cells=spark.read.parquet(d)
            .select("vec_id", "embedding", "cell")).collect())
    assert pairs(grown) == pairs(one_shot)


def test_multiprobe_append_contracts(spark, sf_dir, tmp_path):
    """The refusal/redelivery surface: single-probe layouts refused,
    centroid-slot ids refused, overlapping batches refused, and
    skip_existing turns an at-least-once redelivery into a no-op."""
    from duckdb_hybrid_doc_search_spark.index.ivf_layout import (
        append_multiprobe_vectors, write_ivf_multiprobe,
        write_ivf_partitioned)

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 7 != 3)
    batch = emb.where(F.col("vec_id") % 7 == 3).where(
        F.col("vec_id") % 50 != 0)  # no centroid-slot ids

    single = str(tmp_path / "single")
    write_ivf_partitioned(emb, single)
    with pytest.raises(ValueError, match="single-probe"):
        append_multiprobe_vectors(spark, single, batch)

    multi = str(tmp_path / "multi")
    write_ivf_multiprobe(base, multi, p=2)
    with pytest.raises(ValueError, match="centroid_pred"):
        append_multiprobe_vectors(
            spark, multi, emb.where(F.col("vec_id") == 0))
    append_multiprobe_vectors(spark, multi, batch)
    n_after = spark.read.parquet(multi).count()
    with pytest.raises(ValueError, match="overlaps"):
        append_multiprobe_vectors(spark, multi, batch)
    # redelivery of the SAME batch with skip_existing: no new rows
    append_multiprobe_vectors(spark, multi, batch, skip_existing=True)
    assert spark.read.parquet(multi).count() == n_after
