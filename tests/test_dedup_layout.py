"""The written minhash-signature store (index/dedup_layout) behind
incremental dedup: probe == self-contained form, append maintenance
doesn't drift, id-overlap and missing-store appends refuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.dedup_layout import (
    append_dedup_signatures, ensure_dedup_append_layout,
    ensure_dedup_layout, write_dedup_signatures)
from duckdb_hybrid_doc_search_spark.operators import dedup


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_probe_equals_self_contained(spark, sf_dir, tmp_path):
    """The layout-probe form must be value-identical to the r7
    self-contained form (per-doc-deterministic signatures)."""
    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing, out)
    probe = dedup.dedup_incremental_probe(spark, docs, out)
    direct = dedup.dedup_incremental_batch(docs)
    assert _rows(probe) == _rows(direct)


def test_append_maintained_store_matches_one_shot(spark, sf_dir, tmp_path):
    """base build + append == one-shot build, probed result identical."""
    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    base = str(tmp_path / "base")
    split = F.col("doc_id") % 7 == 3
    write_dedup_signatures(existing.where(~split), base)
    append_dedup_signatures(spark, base, existing.where(split))
    probe = dedup.dedup_incremental_probe(spark, docs, base)
    direct = dedup.dedup_incremental_batch(docs)
    assert _rows(probe) == _rows(direct)


def test_append_rejects_duplicate_doc_ids(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing, out)
    with pytest.raises(ValueError, match="overlaps the signature store"):
        append_dedup_signatures(spark, out, existing.limit(2))


def test_append_refuses_missing_store(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).limit(2)
    with pytest.raises(ValueError, match="no completed signature layout"):
        append_dedup_signatures(spark, str(tmp_path / "nope"), docs)


def test_ensure_layouts_cache_and_agree(spark, sf_dir, tmp_path):
    """ensure_* builds once (sentinel present -> second call is a no-op
    returning the same dir) and the append-maintained variant probes to
    the same decisions as the one-shot variant."""
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    root1 = str(tmp_path / "r1")
    root2 = str(tmp_path / "r2")
    d1 = ensure_dedup_layout(spark, existing, sf_dir, root=root1)
    m1 = os.path.getmtime(os.path.join(d1, "_LAYOUT_DONE"))
    assert ensure_dedup_layout(spark, existing, sf_dir, root=root1) == d1
    assert os.path.getmtime(os.path.join(d1, "_LAYOUT_DONE")) == m1
    d2 = ensure_dedup_append_layout(spark, existing, sf_dir, root=root2)
    p1 = dedup.dedup_incremental_probe(spark, docs, d1)
    p2 = dedup.dedup_incremental_probe(spark, docs, d2)
    assert _rows(p1) == _rows(p2)


def test_append_crash_recovery_is_idempotent(spark, sf_dir, tmp_path):
    """Crash-safety pin for the staged append: simulate a crash AFTER
    the bands/sigs tiers moved but BEFORE the fp tier (delete the
    appended fp files), then retry the SAME batch — the retry must
    clean its own orphans (no overlap error, no duplicated signature
    rows) and the final store must probe identically to a one-shot
    build."""
    import glob
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    split = F.col("doc_id") % 7 == 3
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing.where(~split), out)
    batch = existing.where(split)
    append_dedup_signatures(spark, out, batch)
    # simulate the crash window: fp tier's append files never landed
    fp_appended = glob.glob(os.path.join(out, "fp", "append-*"))
    assert fp_appended, "append must write id-tagged fp files"
    for f in fp_appended:
        os.remove(f)
    # retry of the same batch: must not raise, must not double-append
    append_dedup_signatures(spark, out, batch)
    n_sig = spark.read.parquet(os.path.join(out, "sigs")).count()
    from duckdb_hybrid_doc_search_spark.operators.dedup import (
        MINHASH_NUM)
    assert n_sig == existing.count() * MINHASH_NUM  # no duplicates
    probe = dedup.dedup_incremental_probe(spark, docs, out)
    direct = dedup.dedup_incremental_batch(docs)
    assert _rows(probe) == _rows(direct)


def test_orphan_appends_swept_on_next_append(spark, sf_dir, tmp_path):
    """A crashed append that is NEVER redelivered (bands/sigs landed,
    fp didn't) must not leave its docs half-visible forever: the next
    append of any OTHER batch sweeps the orphans, so the store equals
    base + the second batch only and still probes consistently."""
    import glob
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    mod7 = F.col("doc_id") % 7
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing.where(~mod7.isin(3, 5)), out)
    # batch A appends fully, then we simulate its crash window (fp gone)
    append_dedup_signatures(spark, out, existing.where(mod7 == 3))
    orphaned_fp = glob.glob(os.path.join(out, "fp", "append-*"))
    assert orphaned_fp
    for f in orphaned_fp:
        os.remove(f)
    n_orphan_bands = len(glob.glob(os.path.join(out, "bands", "append-*")))
    assert n_orphan_bands > 0
    # batch B (different content -> different append id) appends: the
    # sweep removes A's bands/sigs leftovers before B lands
    append_dedup_signatures(spark, out, existing.where(mod7 == 5))
    band_ids = {
        os.path.basename(f)[len("append-"):].rsplit("-", 1)[0]
        for f in glob.glob(os.path.join(out, "bands", "append-*"))
    }
    fp_ids = {
        os.path.basename(f)[len("append-"):].rsplit("-", 1)[0]
        for f in glob.glob(os.path.join(out, "fp", "append-*"))
    }
    assert band_ids == fp_ids and len(fp_ids) == 1
    # store now equals a one-shot build over base + batch B
    want = str(tmp_path / "want")
    write_dedup_signatures(existing.where(mod7 != 3), want)
    got = spark.read.parquet(os.path.join(out, "sigs"))
    exp = spark.read.parquet(os.path.join(want, "sigs"))
    assert _rows(got) == _rows(exp)


def test_append_is_single_writer(spark, sf_dir, tmp_path):
    """A held lockfile makes a second append refuse loudly instead of
    deleting the first writer's staged files (r8 advisor finding)."""
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    out = str(tmp_path / "sig")
    split = F.col("doc_id") % 7 == 3
    write_dedup_signatures(existing.where(~split), out)
    lock = os.path.join(out, "_append.lock")
    with open(lock, "w"):
        pass
    with pytest.raises(RuntimeError, match="append in flight"):
        append_dedup_signatures(spark, out, existing.where(split))
    os.remove(lock)
    append_dedup_signatures(spark, out, existing.where(split))  # now fine
    # and the lock is released after a successful append
    assert not os.path.exists(lock)


def test_explicit_append_id_is_idempotent(spark, sf_dir, tmp_path):
    """Callers holding a stable batch key (the streaming micro-batch id)
    pass it through: a redelivery with the same id replaces its own
    files instead of double-appending."""
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    split = F.col("doc_id") % 7 == 3
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing.where(~split), out)
    batch = existing.where(split)
    append_dedup_signatures(spark, out, batch, append_id="mb7")
    import glob
    first = sorted(glob.glob(os.path.join(out, "sigs", "append-mb7-*")))
    assert first
    # crash window: fp gone, then the SAME micro-batch id redelivers
    for f in glob.glob(os.path.join(out, "fp", "append-mb7-*")):
        os.remove(f)
    append_dedup_signatures(spark, out, batch, append_id="mb7")
    from duckdb_hybrid_doc_search_spark.operators.dedup import MINHASH_NUM
    n_sig = spark.read.parquet(os.path.join(out, "sigs")).count()
    assert n_sig == existing.count() * MINHASH_NUM


def test_empty_append_is_a_noop(spark, sf_dir, tmp_path):
    """A shard that kept nothing appends nothing — no zero-row append
    files, no error."""
    import glob
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing, out)
    append_dedup_signatures(spark, out, existing.limit(0))
    assert not glob.glob(os.path.join(out, "*", "append-*"))
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_null_text_docs_never_exact_dup_each_other(spark, sf_dir, tmp_path):
    """md5(NULL) is NULL, not a fingerprint: two null-text batch docs
    must both be kept (the r9 window form would otherwise group NULL
    fps into one keep-min partition — review finding)."""
    from duckdb_hybrid_doc_search_spark.operators.dedup import (
        decide_batch_against_store)

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing, out)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    batch = spark.createDataFrame(
        [(max_id + 1, None), (max_id + 2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["decision"]
           for r in decide_batch_against_store(spark, batch, out).collect()}
    assert got == {max_id + 1: "kept", max_id + 2: "kept"}


def test_crashed_sibling_stage_is_reaped(spark, sf_dir, tmp_path):
    """A staged dir left by a crashed, never-redelivered append is
    reaped by the NEXT append (single-writer lock makes that safe) —
    staging must not grow without bound across crashes (review
    finding)."""
    import os

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % dedup.BATCH_MOD != 0)
    split = F.col("doc_id") % 7 == 3
    out = str(tmp_path / "sig")
    write_dedup_signatures(existing.where(~split), out)
    # simulate a crashed append's staged residue
    stale = os.path.join(out, "_staging", "deadbeef00000000", "fp")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "wb") as f:
        f.write(b"x")
    append_dedup_signatures(spark, out, existing.where(split))
    assert not os.path.exists(os.path.join(out, "_staging"))
