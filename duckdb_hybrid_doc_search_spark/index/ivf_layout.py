"""IVF cells as write-time partitions — the storage half of the ANN story.

operators/knn.ivf_topk computes cell assignment at query time (oracle-
exact); at 100 TB the assignment happens ONCE at write time and the cell
becomes a parquet partition column. A probe then reads only its nprobe
cell directories — partition PRUNING, visible in the scan's
PartitionFilters, so scan cost is nprobe/n_cells of the corpus by
construction. tests/test_ivf_layout.py asserts both the pruned plan and
result equality with the query-time operator.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import DEDUP_IVF_NPROBE
from ..operators.knn import NPROBE, centroid_pred, derive_nlist, ivf_assign

# Encode-semantics version token in the cache key (see ivfpq_layout).
LAYOUT_FORMAT = "v3"  # v3: nlist derived from corpus count at build

# Completion sentinel written LAST, after every side table: parquet's own
# _SUCCESS lands when the (first-written) codes dir commits, so a crash
# between the codes write and the side-table writes would otherwise leave
# a cached layout that looks complete but has no centroid table
# (fts_layout.py's write-the-sentinel-last convention).
LAYOUT_DONE = "_LAYOUT_DONE"


def write_ivf_partitioned(emb: DataFrame, out_dir: str,
                          nlist: int | None = None,
                          centroids: str | DataFrame = "sample") -> None:
    """embeddings + cell assignment, partitioned by cell on disk. The
    (~sqrt(N)-row) centroid table is ALSO written, to
    `<out_dir>_centroids` — incremental appends read it back instead of
    scanning the whole layout for centroid_pred rows (a rebuild-sized
    read at 100 TB). ``nlist`` defaults to derive_nlist over THIS
    frame's count; a builder indexing a partial frame (the append
    layout's 80% base) passes the full-corpus nlist so the frozen
    centroid set equals a one-shot build's. The chosen nlist is
    PERSISTED in `<out_dir>_meta.json` — the frozen-at-build contract:
    appends must guard centroid slots against the build's nlist, never a
    re-derived one (the corpus has grown by then). Side files live next
    to, not inside, the cell root: a subdirectory would be misread as
    data by the partitioned scan. The LAYOUT_DONE sentinel lands last,
    after every side file.

    ``centroids`` picks the centroid SOURCE (the pluggable quality knob
    on an unchanged cell layout):

    - ``"sample"`` — the deterministic id-stride subsample
      (knn.centroid_pred; oracle-exact, the default);
    - ``"kmeans"`` — Lloyd-TRAINED centroids (knn.kmeans_centroids) —
      higher recall at equal nlist on clustered real-world embedding
      distributions; training is write-time cost, frozen thereafter;
    - a (cent_id, cvec) DataFrame — a caller-supplied frozen set (the
      append-equivalence tests build the 80% base against the FULL
      corpus's trained set this way, mirroring the full-corpus-nlist
      rule of the sampled scheme).

    The source is persisted in the layout meta: appends against a
    trained layout must skip the centroid_pred slot guard (trained
    cent_ids are synthetic 0..nlist-1, not reserved data ids)."""
    if nlist is None:
        nlist = derive_nlist(emb.count())
    if isinstance(centroids, DataFrame):
        # pin the caller's frame first: the guard below plus the
        # assignment crossJoin plus the centroid write would otherwise
        # re-execute its lineage three times — a full Lloyd retrain per
        # pass when the caller hands kmeans_centroids(emb) uncached
        # (r12 review finding). The table is ~sqrt(N) rows; eager
        # localCheckpoint is a bounded write-time cost.
        centroids = centroids.localCheckpoint(eager=True)
        # appends waive the centroid_pred slot guard for every
        # non-'sample' source on the grounds that its cent_ids are
        # SYNTHETIC slot ids (0..nlist-1), never data vec_ids. 'kmeans'
        # guarantees that by construction; a caller-supplied frozen set
        # must PROVE it at write time (r11 ADVICE: freezing the
        # id-stride sample — whose cent_ids ARE data vec_ids — and then
        # appending one of those ids would silently corrupt cell
        # membership instead of raising). One bounded 1-row aggregate,
        # paid once per build.
        stats = centroids.agg(
            F.min("cent_id").alias("lo"), F.max("cent_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cent_id").alias("nd"),
        ).collect()[0]
        if (stats["n"] == 0 or stats["lo"] < 0 or stats["hi"] >= nlist
                or stats["n"] != stats["nd"]):
            raise ValueError(
                f"frozen centroid table must use synthetic slot ids "
                f"0..{nlist - 1} (distinct, in range) — got "
                f"min={stats['lo']} max={stats['hi']} n={stats['n']} "
                f"distinct={stats['nd']}. Data-vec_id centroid sets "
                "(e.g. a frozen id-stride sample) are refused: appends "
                "waive the slot guard for 'frozen' layouts, so a data "
                "id doubling as a cent_id would corrupt cell "
                "membership on the first append that reuses it."
            )
        cent, source = centroids, "frozen"
    elif centroids == "kmeans":
        from ..operators.knn import kmeans_centroids

        cent, source = kmeans_centroids(emb, k=nlist), "kmeans"
    elif centroids == "sample":
        cent, source = None, "sample"
    else:
        # a typo ("lloyd", "Kmeans") must not silently build the
        # low-recall sampled layout the caller did not ask for
        raise ValueError(
            f"unknown centroid source {centroids!r}: pass 'sample', "
            "'kmeans', or a (cent_id, cvec) DataFrame"
        )
    if cent is None:
        cent, assign = ivf_assign(emb, nlist=nlist)
    else:
        from ..operators.knn import assign_to_centroids

        assign = assign_to_centroids(
            emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec")),
            cent,
        )
    emb.join(assign, emb["vec_id"] == assign["c_id"]).select(
        "vec_id", "embedding", "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(out_dir)
    cent.write.mode("overwrite").parquet(_centroid_dir(out_dir))
    write_layout_meta(out_dir, nlist, source)
    with open(os.path.join(out_dir, LAYOUT_DONE), "w"):
        pass


def _centroid_dir(out_dir: str) -> str:
    return out_dir.rstrip("/") + "_centroids"


def _meta_path(out_dir: str) -> str:
    return out_dir.rstrip("/") + "_meta.json"


def write_layout_meta(out_dir: str, nlist: int,
                      centroid_source: str = "sample") -> None:
    """Frozen build parameters, written before the completion sentinel.
    Shared with ivfpq_layout (same frozen-centroid contract).
    ``centroid_source`` records how the centroid table was produced
    ("sample" | "kmeans" | "frozen") — appends use it to decide whether
    the centroid_pred slot guard applies (sample only)."""
    from ..operators.knn import CENTROID_MOD

    with open(_meta_path(out_dir), "w") as f:
        json.dump({"nlist": nlist, "centroid_mod": CENTROID_MOD,
                   "centroid_source": centroid_source}, f)


def read_layout_meta(out_dir: str) -> dict:
    """Read back the frozen build parameters; REFUSE a layout without
    them — re-deriving nlist from the current corpus count would guard
    (and assign) against a different centroid set than the one existing
    cells were built with, silently corrupting membership."""
    path = _meta_path(out_dir)
    if not os.path.exists(path):
        raise ValueError(
            f"layout at {out_dir} has no {os.path.basename(path)}: it "
            "predates the derived-nlist rule, and the build's centroid "
            "slot range cannot be reconstructed from the current corpus "
            "count (nlist is frozen at build time). Rebuild the layout "
            "before appending."
        )
    with open(path) as f:
        return json.load(f)


def ensure_ivf_layout(spark: SparkSession, emb: DataFrame,
                      sf_dir: str, root: str | None = None) -> str:
    """Build (once) and return the cell-partitioned layout dir for sf_dir.

    Write-time index construction, amortized across every subsequent
    probe. The cache key is the data dir's basename PLUS a staleness
    fingerprint (``index/fingerprint``: driver-side file stats for
    file-backed embeddings — zero Spark jobs on the warm path — else one
    content-hash scan over (vec_id, embedding) VALUES), so regenerated
    testdata with stable vec_ids but different vectors rebuilds instead
    of silently probing stale cells. Rooted at the repo directory, not
    the process CWD.
    """
    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    if not os.path.exists(os.path.join(out_dir, LAYOUT_DONE)):
        import shutil

        if os.path.exists(out_dir):  # partial prior attempt: start clean
            shutil.rmtree(out_dir)
        write_ivf_partitioned(emb, out_dir)
    return out_dir


def ensure_ivf_trained_layout(spark: SparkSession, emb: DataFrame,
                              sf_dir: str, root: str | None = None) -> str:
    """Build (once) the KMEANS-TRAINED cell-partitioned layout for
    sf_dir — the production-shaped path for real (clustered,
    anisotropic) embedding distributions, where Lloyd centroids beat the
    id-stride sample at equal nlist (r10 VERDICT #4: the seam existed
    but no written layout persisted trained centroids). Same cache-key
    discipline as ensure_ivf_layout; training cost is paid once at
    write time and the trained set is frozen in the `_centroids` side
    table, so appends and probes never retrain."""
    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_trained_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}-kmeans"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    if not os.path.exists(os.path.join(out_dir, LAYOUT_DONE)):
        import shutil

        if os.path.exists(out_dir):  # partial prior attempt: start clean
            shutil.rmtree(out_dir)
        write_ivf_partitioned(emb, out_dir, centroids="kmeans")
    return out_dir


def write_ivf_multiprobe(emb: DataFrame, out_dir: str,
                         nlist: int | None = None, p: int = DEDUP_IVF_NPROBE,
                         extra_meta: dict | None = None) -> None:
    """The MULTI-PROBE cell assignment persisted for cell-bucketed
    dedup (r11 VERDICT #2): (vec_id, embedding, cell) with each vector
    in its top-``p`` cells, partitioned by cell on disk. Single-probe
    assignment loses near-dup pairs whose members straddle a cell
    boundary; storing each vector in its p nearest cells recovers them
    while the within-cell pair space stays ~p^2 * N^1.5 / 2 — the
    standard multi-probe trade, paid once at write time (storage is p
    rows per vector; the dedup query is one co-located three-column
    scan with no assignment crossJoin). Same frozen id-stride centroid
    set as write_ivf_partitioned's 'sample' source, so the DuckDB
    oracle reproduces the assignment exactly."""
    from ..operators.knn import derive_nlist, ivf_assign

    if nlist is None:
        nlist = derive_nlist(emb.count())
    # the single-source sample-centroid rule (knn.ivf_assign), widened
    # to top-p rows per vector
    cent, assign = ivf_assign(emb, nlist=nlist, p=p)
    emb.join(assign, emb["vec_id"] == assign["c_id"]).select(
        "vec_id", "embedding", "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(out_dir)
    cent.write.mode("overwrite").parquet(_centroid_dir(out_dir))
    with open(_meta_path(out_dir), "w") as f:
        from ..operators.knn import CENTROID_MOD

        json.dump({"nlist": nlist, "centroid_mod": CENTROID_MOD,
                   "centroid_source": "sample", "multiprobe_p": p,
                   **(extra_meta or {})}, f)
    with open(os.path.join(out_dir, LAYOUT_DONE), "w"):
        pass


def ensure_ivf_multiprobe_layout(spark: SparkSession, emb: DataFrame,
                                 sf_dir: str, root: str | None = None,
                                 p: int = DEDUP_IVF_NPROBE) -> str:
    """Build (once) the multi-probe dedup assignment layout for sf_dir —
    same cache-key discipline as ensure_ivf_layout, keyed additionally
    by ``p`` (a different probe width is a different artifact)."""
    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_multiprobe_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}-p{p}"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    if not os.path.exists(os.path.join(out_dir, LAYOUT_DONE)):
        import shutil

        if os.path.exists(out_dir):  # partial prior attempt: start clean
            shutil.rmtree(out_dir)
        write_ivf_multiprobe(emb, out_dir, p=p)
    return out_dir


def ensure_ivf_multiprobe_whitened_layout(spark: SparkSession,
                                          emb: DataFrame, sf_dir: str,
                                          root: str | None = None,
                                          p: int = DEDUP_IVF_NPROBE) -> str:
    """The WHITENED multiprobe dedup layout (r13 VERDICT #2: the 100 TB
    dedup path bucketed RAW anisotropic cosine while the whitening
    correction lived only in the exact diagnostic — common-direction
    energy distorts both the centroids and the threshold): standardize
    per dimension first (operators/dedup.whiten_stats — one bounded
    Arrow-partials pass), then build the same top-p cell layout OVER
    the z-vectors. The moments are FROZEN IN THE LAYOUT META
    (whiten_mu / whiten_sd) exactly like the frozen centroid contract,
    so a future append whitens arriving vectors against the build-time
    statistics instead of silently re-deriving drifted ones."""
    from ..operators.dedup import apply_whitening, whiten_stats
    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_multiprobe_whitened_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}-p{p}"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    if not os.path.exists(os.path.join(out_dir, LAYOUT_DONE)):
        import shutil

        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        mu, sd = whiten_stats(emb)
        z = apply_whitening(emb, mu, sd)
        write_ivf_multiprobe(z, out_dir, p=p,
                             extra_meta={"whitened": True,
                                         "whiten_mu": mu,
                                         "whiten_sd": sd})
    return out_dir


def append_multiprobe_vectors(spark: SparkSession, out_dir: str,
                              new_emb: DataFrame,
                              skip_existing: bool = False) -> None:
    """Incremental maintenance for the MULTI-PROBE dedup layout (r12
    VERDICT #2: write_ivf_multiprobe was overwrite-only, so an ingest
    loop wanting embedding-level near-dup decisions against a growing
    corpus had to rebuild): assign arriving vectors to their top-p
    cells against the layout's FROZEN centroid table and append the p
    rows per vector to their cell partitions — the top-p invariant is
    preserved because append assignment and build assignment share one
    rule (knn.assign_to_centroids with the layout's persisted ``p``),
    so base+append equals a one-shot build row-for-row
    (tests/test_dedup_embedding_ivf.py pins it, and the registered
    ``dedup_embedding_ivf_append_probe`` gates it against the same
    one-shot oracle every driver rotation).

    Contract mirrors :func:`append_ivf_vectors` one function up: the
    frozen-nlist/frozen-centroid rule, the sample-source slot guard
    (centroid_pred ids are centroid slots, not appendable members), the
    pruned disjointness check (a redelivered identical vector lands in
    its original p cells, so scanning only the batch's target cells
    catches duplicate-row corruption exactly), and the
    ``skip_existing`` at-least-once redelivery contract. A NON-
    multiprobe layout is refused — its probes expect one row per
    vector, and a p-row append would corrupt them the same way a
    1-row append corrupts the multiprobe invariant."""
    from ..operators.knn import assign_to_centroids

    if new_emb.isEmpty():
        return
    meta = read_layout_meta(out_dir)
    p = meta.get("multiprobe_p")
    if not p:
        raise ValueError(
            f"layout at {out_dir} is a single-probe layout: "
            "append_multiprobe_vectors writes top-p rows per vector "
            "and would corrupt its one-row-per-vector invariant. Use "
            "append_ivf_vectors for single-probe layouts."
        )
    nlist = meta["nlist"]
    if meta.get("centroid_source", "sample") == "sample":
        n_cent_ids = new_emb.where(centroid_pred("vec_id", nlist)).count()
        if n_cent_ids:
            raise ValueError(
                f"append batch contains {n_cent_ids} vec_id(s) matching "
                "centroid_pred: those ids are centroid slots under the "
                "frozen-centroid contract — appending them as plain "
                "members would make the assignment rule treat them as "
                "centroids of nonexistent cells. Rebuild the layout to "
                "re-center instead."
            )
    cdir = _centroid_dir(out_dir)
    if not os.path.exists(cdir):
        raise ValueError(
            f"layout at {out_dir} has no _centroids side table — its "
            "build-time centroid set cannot be reconstructed "
            "consistently with existing cell membership. Rebuild via "
            "write_ivf_multiprobe before appending."
        )
    cent = spark.read.parquet(cdir)
    assign = assign_to_centroids(
        new_emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec")),
        cent, p=p,
    )
    batch = new_emb.join(
        assign, new_emb["vec_id"] == assign["c_id"]
    ).select("vec_id", "embedding", "cell")
    target_cells = sorted(
        r.cell for r in assign.select("cell").distinct().collect()
    )
    dup_ids = (
        probe_cells(spark, out_dir, target_cells)
        .select("vec_id")
        .join(F.broadcast(new_emb.select("vec_id")), "vec_id")
        .distinct()  # an existing vector matches in up to p cells
    )
    if skip_existing:
        dup_local = dup_ids.localCheckpoint(eager=True)
        batch = batch.join(
            F.broadcast(dup_local),
            batch["vec_id"] == dup_local["vec_id"],
            "left_anti",
        )
        if batch.isEmpty():
            return
    else:
        n_dup = dup_ids.count()
        if n_dup:
            raise ValueError(
                f"append batch overlaps the layout on {n_dup} vec_id(s): "
                "appending an existing id writes duplicate rows into its "
                "p cell partitions and the dedup probe would emit "
                "duplicate pairs. Append batches must carry NEW vec_ids "
                "only (or pass skip_existing=True, the streaming "
                "redelivery contract)."
            )
    batch.write.mode("append").partitionBy("cell").parquet(out_dir)


def ensure_ivf_multiprobe_append_layout(spark: SparkSession,
                                        emb: DataFrame, sf_dir: str,
                                        root: str | None = None,
                                        p: int = DEDUP_IVF_NPROBE) -> str:
    """Build (once) a multiprobe dedup layout that REACHED its final
    state through incremental maintenance: base build over ~80% of the
    vectors (nlist and the centroid set derived from the FULL corpus,
    the append-equivalence rule), the remaining ~20% (non-centroid ids
    with vec_id % 5 == 3) appended via
    :func:`append_multiprobe_vectors`. Probing it is how the registered
    ``dedup_embedding_ivf_append_probe`` query earns its driver row:
    frozen-centroid append equivalence means the dedup pair set must
    hash-match the one-shot oracle over the full table."""
    import shutil

    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_multiprobe_append_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}-p{p}"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    sentinel = os.path.join(out_dir, "_APPEND_DONE")
    if os.path.exists(sentinel):
        return out_dir
    if os.path.exists(out_dir):  # partial prior attempt: start clean
        shutil.rmtree(out_dir)
    nlist = derive_nlist(emb.count())
    is_new = (~centroid_pred("vec_id", nlist)) & (
        F.col("vec_id") % APPEND_SPLIT_MOD == APPEND_SPLIT_REM
    )
    write_ivf_multiprobe(emb.where(~is_new), out_dir, nlist=nlist, p=p)
    append_multiprobe_vectors(spark, out_dir, emb.where(is_new))
    with open(sentinel, "w"):
        pass
    return out_dir


def read_layout_centroids(spark: SparkSession, out_dir: str) -> DataFrame:
    """The layout's FROZEN (cent_id, cvec) centroid table — the build's
    set, whatever its source; probes and appends share it so cell
    definition never drifts."""
    cdir = _centroid_dir(out_dir)
    if not os.path.exists(cdir):
        raise ValueError(
            f"layout at {out_dir} has no _centroids side table — "
            "rebuild with write_ivf_partitioned before probing."
        )
    return spark.read.parquet(cdir)


def ivf_frozen_layout_topk(spark: SparkSession, out_dir: str,
                           queries: DataFrame, k: int) -> DataFrame:
    """IVF top-k against a WRITTEN layout using its frozen centroid
    table (read from the side table — never recomputed, so the probe is
    centroid-source-agnostic: sampled, trained, and caller-frozen
    layouts all probe identically). ``queries`` carries (q_id, q_vec).
    Candidates come from the partition-PRUNED cell scan: cost is
    nprobe/nlist of the layout by construction.

    r14: probe selection moves to the driver (the frozen centroid side
    table is the bounded set the old plan broadcast; per query the top-
    NPROBE cells by rounded cosine desc / cent_id asc — the old window
    ordering via stable argsort over cid-sorted centroids) and the
    pruned cell scan is scored by ONE Arrow-GEMM pass instead of the
    probes join + interpreted HOF cosine per (query, candidate) + a
    window over every scored pair: each batch scores the queries whose
    probe set contains a row's cell and emits its LOCAL top-k per query
    by the exact global ordering — a superset of the global top-k,
    ranked by the unchanged final window. Partition pruning is
    untouched (the scan still reads only the probed cells)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from ..config import SCORE_ROUND

    cent_rows = sorted(
        read_layout_centroids(spark, out_dir).collect(),
        key=lambda r: r["cent_id"],
    )
    qrows = sorted(queries.collect(), key=lambda r: r["q_id"])
    out_schema = T.StructType([
        T.StructField("q_id", queries.schema["q_id"].dataType),
        T.StructField("c_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])
    if not qrows or not cent_rows:
        scored = spark.createDataFrame([], out_schema)
    else:
        CC = np.array([[float(x) for x in r["cvec"]] for r in cent_rows],
                      dtype=np.float64)
        cc_ids = np.array([int(r["cent_id"]) for r in cent_rows],
                          dtype=np.int64)
        ccn = np.sqrt((CC * CC).sum(axis=1))
        Qm = np.array([[float(x) for x in r["q_vec"]] for r in qrows],
                      dtype=np.float64)
        q_ids = np.array([r["q_id"] for r in qrows])
        qnorm = np.sqrt((Qm * Qm).sum(axis=1))
        qsims = np.round(
            (Qm @ CC.T) / (qnorm[:, None] * ccn[None, :]), SCORE_ROUND
        )
        take = min(NPROBE, len(cc_ids))
        pidx = np.argsort(-qsims, axis=1, kind="stable")[:, :take]
        probe_sets = [set(cc_ids[pidx[j]].tolist())
                      for j in range(len(q_ids))]
        probe_cell_ids = sorted(set().union(*probe_sets))

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                c_ids = pdf["vec_id"].to_numpy()
                cells = pdf["cell"].to_numpy()
                sims = np.round(
                    (X @ Qm.T)
                    / (np.sqrt((X * X).sum(axis=1))[:, None]
                       * qnorm[None, :]),
                    SCORE_ROUND,
                )
                qi, ci = [], []
                for j in range(len(q_ids)):
                    keep = np.flatnonzero(
                        np.isin(cells, list(probe_sets[j])))
                    order = np.lexsort(
                        (c_ids[keep], -sims[keep, j]))[:k]
                    sel = keep[order]
                    qi.append(np.full(len(sel), j, dtype=np.int64))
                    ci.append(sel)
                qi = np.concatenate(qi)
                ci = np.concatenate(ci)
                yield pd.DataFrame({
                    "q_id": q_ids[qi],
                    "c_id": c_ids[ci],
                    "cos_sim": sims[ci, qi],
                })

        scored = (
            probe_cells(spark, out_dir, probe_cell_ids)
            .select("vec_id", "embedding", "cell")
            .mapInPandas(fn, out_schema)
        )
    wk = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
    )


# append-probe split rule: ~20% of non-centroid ids arrive via append
APPEND_SPLIT_MOD = 5
APPEND_SPLIT_REM = 3


def ensure_ivf_append_layout(spark: SparkSession, emb: DataFrame,
                             sf_dir: str, root: str | None = None) -> str:
    """Build (once) a layout that REACHED its final state through
    incremental maintenance: base build over ~80% of the vectors, the
    remaining ~20% (non-centroid ids with vec_id % 5 == 3) appended via
    :func:`append_ivf_vectors`. Probing it is how the registered
    ``ann_ivf_append_probe`` query earns a driver row for the append
    path: frozen-centroid append equivalence means the result must equal
    the one-shot oracle over the full table.

    Cached separately from ensure_ivf_layout (appends mutate the dir, so
    it must never share the build-once cache); a ``_APPEND_DONE``
    sentinel marks the completed build+append sequence and the dir key
    carries the source fingerprint so regenerated data rebuilds.
    """
    import shutil

    from .fingerprint import layout_fingerprint, warehouse_root

    root = warehouse_root("ivf_append_layout", root)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'default'}"
        f"-{LAYOUT_FORMAT}"
        f"-{layout_fingerprint(emb, 'vec_id', 'embedding')}"
    )
    out_dir = os.path.join(root, key)
    sentinel = os.path.join(out_dir, "_APPEND_DONE")
    if os.path.exists(sentinel):
        return out_dir
    if os.path.exists(out_dir):  # partial prior attempt: start clean
        shutil.rmtree(out_dir)
    # nlist from the FULL corpus count, not the 80% base — the append
    # sequence must end at the exact state a one-shot build over the
    # full table produces, and that build derives nlist from N
    nlist = derive_nlist(emb.count())
    is_new = (~centroid_pred("vec_id", nlist)) & (
        F.col("vec_id") % APPEND_SPLIT_MOD == APPEND_SPLIT_REM
    )
    write_ivf_partitioned(emb.where(~is_new), out_dir, nlist=nlist)
    append_ivf_vectors(spark, out_dir, emb.where(is_new))
    with open(sentinel, "w"):
        pass
    return out_dir


def probe_cells(spark: SparkSession, out_dir: str,
                cells: list[int]) -> DataFrame:
    """Read ONLY the probed cell partitions (pruned scan)."""
    return spark.read.parquet(out_dir).where(F.col("cell").isin(cells))


def ivf_partitioned_topk(spark: SparkSession, out_dir: str,
                         emb: DataFrame, k: int,
                         n_queries: int = 10) -> DataFrame:
    """Same semantics as operators/knn.ivf_topk, but candidates come from
    the pruned partition scan instead of an in-plan assignment join.
    Delegates to :func:`ivf_frozen_layout_topk` (r11): the layout's
    `_centroids` side table IS the in-plan centroid set by the
    append-equivalence contract, so re-deriving it per probe via
    ivf_assign paid an emb.count() action + a stride scan for rows the
    build already persisted."""
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_frozen_layout_topk(spark, out_dir, queries, k)


def append_ivf_vectors(spark: SparkSession, out_dir: str,
                       new_emb: DataFrame,
                       skip_existing: bool = False) -> None:
    """Incremental index maintenance: assign NEW vectors to the layout's
    EXISTING centroids and append them to their cell partitions — no
    rebuild, no rewrite of existing files (the maintenance story a 100 TB
    vector index needs: ingest appends to the hot cells' directories,
    probes keep pruning by partition).

    The centroid set is FROZEN at build time — read back from the
    build's `_centroids` side table, so the cell definition never
    drifts under appends; re-centering is a rebuild, by design. A
    layout WITHOUT the side table is REFUSED: such layouts predate the
    capped centroid rule, so re-deriving their centroid set from the
    current centroid_pred reconstructs at most nlist centroids while the
    on-disk cells span the old uncapped set — appends would be assigned
    against a centroid set inconsistent with existing membership,
    silently corrupting cell assignment and recall. (Recovering from
    the layout's distinct cell values is also unsound: it misses
    empty cells, which were live assignment targets at build time.) A batch containing a
    centroid-modulus vec_id is REJECTED: writing it as a plain cell
    member while query-time ivf_assign would treat it as a centroid
    silently probes a nonexistent cell. The disjoint-vec_id contract is
    ENFORCED, not just documented: the batch is semi-joined against the
    vec_ids already present in the cells it would land in (a partition-
    PRUNED scan bounded by the batch's target cells, never the full
    layout) and overlaps raise — appending an existing id would write
    duplicate rows that probes then return as duplicate candidates.
    Deterministic frozen-centroid assignment means a re-appended
    identical embedding always lands in its original cell, so the pruned
    check catches exactly the duplicate-row corruption; an id REUSED
    with a different vector may land in another cell and stays in the
    caller contract (catching it needs a full-layout id scan — a
    rebuild-sized read at 100 TB). A dir mutated by appends is managed
    explicitly — the ensure_ivf_layout fingerprint cache keys on the
    SOURCE table and must not be pointed at it.
    """
    from ..operators.knn import assign_to_centroids

    if new_emb.isEmpty():
        return  # a micro-batch whose slice filter left nothing
    # the BUILD's frozen nlist, from the layout meta — never re-derived
    # (the corpus has grown since; a bigger nlist would wrongly admit
    # ids that were centroid slots, a smaller one wrongly reject)
    meta = read_layout_meta(out_dir)
    if meta.get("multiprobe_p"):
        # this append writes ONE row per vector (rank-1 cell); a
        # multiprobe layout stores top-p rows per vector, so appending
        # here would silently break the top-p invariant — exactly the
        # boundary-pair loss the multiprobe layout exists to prevent
        # (r12 review finding)
        raise ValueError(
            f"layout at {out_dir} is a multiprobe dedup layout "
            f"(p={meta['multiprobe_p']}): append_ivf_vectors writes "
            "single-probe rows and would corrupt the top-p cell "
            "invariant. Rebuild via ensure_ivf_multiprobe_layout "
            "(the fingerprint key rebuilds on corpus change)."
        )
    nlist = meta["nlist"]
    if meta.get("centroid_source", "sample") == "sample":
        # slot guard applies ONLY to the id-stride sample, whose
        # centroid ids double as data vec_ids; trained/frozen centroid
        # sets use synthetic cent_ids, so any vec_id may append
        n_cent_ids = new_emb.where(centroid_pred("vec_id", nlist)).count()
        if n_cent_ids:
            raise ValueError(
                f"append batch contains {n_cent_ids} vec_id(s) matching "
                "centroid_pred: those ids are centroid slots under the "
                "frozen-centroid contract — appending them as plain "
                "members would make probes target a nonexistent cell. "
                "Rebuild the layout to re-center instead."
            )
    cdir = _centroid_dir(out_dir)
    if not os.path.exists(cdir):
        raise ValueError(
            f"layout at {out_dir} has no _centroids side table: it "
            "predates the capped centroid rule, and no recovery scan "
            "can reconstruct its build-time centroid set consistently "
            "with existing cell membership (see docstring). Rebuild "
            "the layout (write_ivf_partitioned) before appending."
        )
    cent = spark.read.parquet(cdir)
    assign = assign_to_centroids(
        new_emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec")),
        cent,
    )
    batch = new_emb.join(
        assign, new_emb["vec_id"] == assign["c_id"]
    ).select("vec_id", "embedding", "cell")
    # disjointness guard (pruned): only the target cells are scanned, and
    # only their vec_id column; the append batch is the broadcast side
    target_cells = sorted(
        r.cell for r in assign.select("cell").distinct().collect()
    )
    dup_ids = (
        probe_cells(spark, out_dir, target_cells)
        .select("vec_id")
        .join(F.broadcast(new_emb.select("vec_id")), "vec_id")
    )
    if skip_existing:
        # redelivery contract (the FTS append's skip_existing twin):
        # deterministic frozen-centroid assignment means a re-appended
        # identical vector lands in its ORIGINAL cell, so the pruned
        # dup set is exactly the already-applied subset — subtract it
        # and an at-least-once redelivery reduces to a no-op instead of
        # duplicate candidate rows. Batch-bounded, pinned before the
        # broadcast anti-join.
        dup_local = dup_ids.localCheckpoint(eager=True)
        batch = batch.join(
            F.broadcast(dup_local),
            batch["vec_id"] == dup_local["vec_id"],
            "left_anti",
        )
        if batch.isEmpty():
            return  # full redelivery of an already-applied batch
    else:
        n_dup = dup_ids.count()
        if n_dup:
            raise ValueError(
                f"append batch overlaps the layout on {n_dup} vec_id(s): "
                "appending an existing id writes duplicate rows into its "
                "cell partition and probes would return duplicate "
                "candidates. Append batches must carry NEW vec_ids only "
                "(or pass skip_existing=True to drop them, the streaming "
                "redelivery contract)."
            )
    batch.write.mode("append").partitionBy("cell").parquet(out_dir)
